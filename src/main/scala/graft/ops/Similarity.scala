package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Hashing
import graft.functions.exprs._

/** Nearest-neighbor search over the `embeddings` table (64-dim floats).
  *
  *  - `q_cosine_topk` ([[cosineTopK]]): EXACT top-k for a probe subset,
  *    oracle-checked against DuckDB list_dot_product. Probes broadcast,
  *    candidates stream through a codegen'd [[graft.functions.DotFF]],
  *    and a partial top-k Aggregator keeps the scored pairs map-side —
  *    the shuffle is O(partitions × probes × k), not N×P.
  *  - `q_ann_lsh_topk` ([[annLshTopK]]): multi-table random-hyperplane
  *    LSH with query-directed multiprobe — the sub-scan lookup shape FOR
  *    CLUSTERED CORPORA (the realistic near-dup/embedding regime).
  *    Measured on a constructed 40-cluster fixture (QueriesSpec): 6×8-bit
  *    tables, 4 probes/table → recall@10 = 1.0 at 31% candidates (gate:
  *    ≥0.7 at ≤⅓, asserted). On the isotropic test corpus — a worst case
  *    with no structure for buckets to exploit — the same operator tracks
  *    its candidate fraction (0.54 at 37% with the 6-bit default);
  *    [[screenTopK]] is the better trade there. Bucket width is the
  *    corpus knob: 2^planes must exceed the cluster count.
  *  - `q_ann_screen_topk` ([[screenTopK]]): partial-dot screen + exact
  *    re-rank — recall@10 = 0.82 at 20% fully-scored candidates on the
  *    same vectors (measured), the better trade on unstructured data.
  *  - `q_ann_ivf_topk` ([[annIvfTopK]]): IVF — k-means-lite coarse
  *    quantizer (deterministic Lloyd), nearest-cell index, nprobe cell
  *    scan. The learned-partition shape that wins on clustered corpora.
  *
  * Cosine values are rounded to 6 dp before ranking (ties broken by
  * candidate id) so rank order is engine-independent.
  */
object Similarity {

  final val NumPlanes = 6
  final val NumTables = 6
  final val Dim       = 64

  /** Hamming radius for the multi-index binary search (q_hamming_mih). */
  final val MihTau    = 15
  /** Substring chunks the 64-bit sign code splits into (16 bits each). */
  final val MihChunks = 4
  /** Per-chunk probe radius: floor(tau / chunks) — the MIH pigeonhole. */
  final val MihRadius = MihTau / MihChunks
  /** Production-width 128-bit index: 8 chunks keep the per-chunk probe
    * radius at floor(31/8) = 3 — the same 697-mask neighborhood as the
    * 64-bit index — at the matched RELATIVE tolerance (31/128 ≈ 15/64).
    * What the doubled width buys is verification precision, not a lower
    * candidate floor: a random pair passes the final ≤ tau check with
    * probability P(Binom(128,½) ≤ 31) ≈ 2.2e-9 vs P(Binom(64,½) ≤ 15)
    * ≈ 1.3e-5 — four orders of magnitude fewer background pairs in the
    * OUTPUT, while candidate work stays Θ(n²·p) with p ≈ 8·1.06%
    * (p grows ∝ chunks at fixed chunk width; driving p itself down
    * takes LONGER chunks, i.e. chunk bits sized to log₂ n — Norouzi's
    * m = b/log₂ n rule — not more of them).
    */
  final val Mih128Tau    = 31
  final val Mih128Chunks = 8

  /** Sign codes of an (vec_id, embedding) frame as two 32-bit halves —
    * split so no value ever sets bit 63 (DuckDB aggregates over a negative
    * BIGINT promote to HUGEINT where Spark wraps; the integer-magnitude
    * rule). Bit i of lo/hi is the sign of dimension i / i+32.
    */
  private[graft] def signCodes(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i] > 0, shiftleft(1L, i), 0L))").as("lo"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i + 32] > 0, shiftleft(1L, i), 0L))").as("hi"))

  /** 128-bit codes: words w0/w1 are the [[signCodes]] sign bits; w2/w3
    * extend them with ORDER bits — bit i compares adjacent coordinates
    * (x[i] > x[(i+1) mod 64]), the Winner-Take-All rank-hash family
    * (Yagnik et al. 2011): rank comparisons are scale- and
    * offset-invariant and exact in both engines (one float > float).
    * Production similarity fingerprints run 128 bits (Norouzi et al.'s
    * own evaluation width); this is that parameterization over the same
    * 64-dim inputs.
    */
  private[graft] def signCodes128(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i] > 0, shiftleft(1L, i), 0L))").as("w0"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i + 32] > 0, shiftleft(1L, i), 0L))").as("w1"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i] > embedding[i + 1], shiftleft(1L, i), 0L))").as("w2"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(embedding[i + 32] > embedding[(i + 33) % 64], " +
        "shiftleft(1L, i), 0L))").as("w3"))

  /** Multi-Index-Hashing exact Hamming range search over the sign codes of
    * an explicit embeddings frame (see q_hamming_mih for the argument).
    * The chunk GEOMETRY is sized from the corpus count through the
    * engine's own cost model ([[mihChunksFor]]) rather than pinned at
    * 4×16-bit: the x50 ScaleProbe measured the static geometry's slow
    * regime (153 s vs 20.3 s at 250k codes — bucket occupancy n/2¹⁶
    * multiplies candidate rows), and the sizer reproduces the measured
    * 3-chunk decision there while picking narrow-probe geometries at
    * small n. The count is one long of model state; output is
    * chunk-count-invariant (exact Hamming filter — QueriesSpec proves
    * set equality across geometries and against brute force).
    */
  private[graft] def hammingMih(emb: DataFrame): DataFrame = {
    val codes = signCodes(emb)
    mihPairsChunked(codes, Seq("lo", "hi"), MihTau,
      mihChunksFor(emb.count(), 64, MihTau))
  }

  /** The production-width variant: 128-bit codes, radius Mih128Tau,
    * chunk count sized from the corpus like [[hammingMih]].
    */
  private[graft] def hammingMih128(emb: DataFrame): DataFrame =
    mihPairsChunked(signCodes128(emb), Seq("w0", "w1", "w2", "w3"),
      Mih128Tau, mihChunksFor(emb.count(), 128, Mih128Tau))

  /** The MIH engine, parametric in the code words: `codes` carries
    * `vec_id` plus `words` 32-bit-valued long columns; chunk c is bits
    * [c·16, c·16+16) of their concatenation, probed at radius
    * floor(tau / chunks) — the pigeonhole guarantee that every pair
    * within `tau` collides on some probed chunk key.
    */
  private[graft] def mihPairs(codes: DataFrame, words: Seq[String],
      tau: Int): DataFrame = {
    val chunks = words.length * 2
    val radius = tau / chunks
    // the per-chunk probe neighborhood — a model-state literal (697 masks
    // at radius 3)
    val masks: Seq[Long] =
      (0 until 65536).filter(m => Integer.bitCount(m) <= radius).map(_.toLong)
    val ch = codes.withColumn("ws", array(words.map(col): _*))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${chunks - 1}), c -> " +
          "shiftright(element_at(ws, CAST(c div 2 + 1 AS INT)), (c % 2) * 16) & 65535L)"))
        .as(Seq("c", "key")))
    val probes = ch
      .select(col("vec_id").as("v1"), col("c"), col("key"),
        explode(typedLit(masks)).as("m"))
      .select(col("v1"), col("c"), col("key").bitwiseXOR(col("m")).as("pkey"))
    // SHUFFLE_HASH strategy hint (not a broadcast): the probe side is a
    // 697-way explode whose size Catalyst underestimates — left to its
    // stats, the planner may pick a BROADCAST join and collect the
    // exploded frame to the driver (observed at ScaleProbe x50:
    // maxResultSize abort at ~1 GB). Pinning a shuffled hash join keeps
    // both sides partitioned on (chunk, key) at any scale; the index
    // side builds Θ(rows/partitions) per task.
    val cand = probes.join(
        ch.select(col("vec_id").as("v2"), col("c"), col("key").as("pkey"))
          .hint("SHUFFLE_HASH"),
        Seq("c", "pkey"))
      .filter(col("v1") < col("v2"))
      .select("v1", "v2").distinct()
    val a = codes.select(
      col("vec_id").as("v1") +: words.map(w => col(w).as(s"${w}1")): _*)
    val b = codes.select(
      col("vec_id").as("v2") +: words.map(w => col(w).as(s"${w}2")): _*)
    cand.join(a, "v1").join(b, "v2")
      .select(col("v1"), col("v2"),
        expr(words.map(w => s"bit_count(${w}1 ^ ${w}2)").mkString(" + "))
          .cast("int").as("ham"))
      .filter(col("ham") <= tau)
  }
  /** All Hamming-ball masks of `width` bits up to `radius` flips. */
  private def masksUpTo(width: Int, radius: Int): Seq[Long] = {
    def combos(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until width).flatMap(i =>
        combos(i + 1, left - 1).map(m => m | (1L << i)))
    (0 to radius).flatMap(combos(0, _))
  }

  /** Chunk-count sizing for [[mihPairsChunked]], executable: minimize the
    * engine's actual cost model over valid chunk counts. Per code the
    * index probes m·|masks(m)| chunk keys, and each probe row meets
    * ~n/2^width index entries (bucket occupancy), so
    * cost(m) ≈ n · m · masks(m) · (1 + n/2^width) — the first factor is
    * the probe explode, the second the candidate join fan. This is
    * Norouzi's m = b/log₂(n) intuition with the engine's own constants:
    * the pure formula targets occupancy ≈ 1, but in a shuffled-join
    * engine occupancy multiplies CANDIDATE rows, so the model leans one
    * notch wider (at n=250k, b=64, τ=8 it picks 3 chunks — the
    * configuration the x50 probe measured 7.5× faster than 4×16-bit,
    * where the pure formula rounds to 4). The pigeonhole contract holds
    * for every m ≥ 1 (m·(⌊τ/m⌋+1) ≥ τ+1), so the mask budget (masks are
    * driver-built literal model state) is about probe cost, never
    * correctness.
    */
  private[graft] def mihChunksFor(n: Long, bits: Int, tau: Int,
      maskBudget: Long = 4096L): Int = {
    def nMasks(width: Int, radius: Int): Long = {
      var total = 0L; var c = 1L
      for (k <- 0 to radius) {
        total += c
        c = c * (width - k) / (k + 1)
      }
      total
    }
    val nn = math.max(2L, n).toDouble
    val valid = (1 to bits).filter { m =>
      val width = (bits + m - 1) / m
      width <= 63 && nMasks(width, tau / m) <= maskBudget
    }
    require(valid.nonEmpty, s"no chunk count fits maskBudget=$maskBudget")
    valid.minBy { m =>
      val width = (bits + m - 1) / m
      m.toDouble * nMasks(width, tau / m) *
        (1.0 + nn / math.pow(2.0, width.toDouble))
    }
  }

  /** [[mihPairs]] generalized to an ARBITRARY chunk count over the same
    * 32-bit code words — the Norouzi m = b/log₂(n) sizing lever made
    * executable. Fewer, wider chunks trade a larger per-chunk probe
    * neighborhood for exponentially lower bucket occupancy: at τ = 8
    * over 64-bit codes, 4×16-bit chunks probe 137 masks into 2¹⁶-key
    * buckets (occupancy n/2¹⁶ — past n ≈ 10⁵ the Θ(n²·p) term owns the
    * wall, measured in SCALING.md), while 3×21/22-bit chunks probe
    * 232/254 masks into 2²¹⁺-key buckets — occupancy stays < 1 to
    * n ≈ 2M. Same pigeonhole contract: radius = τ div chunks, and
    * chunks·(radius+1) > τ guarantees every true pair collides on some
    * probed chunk (asserted); the exact Hamming filter at the end is
    * unchanged, so the OUTPUT is identical at any chunk count —
    * QueriesSpec proves set equality against the 16-bit engine.
    */
  /** Chunk geometry shared by the chunked MIH engines: bit offsets of the
    * nChunks chunk boundaries over the concatenated words, per-chunk
    * Hamming-ball mask literals, and the per-chunk key extraction
    * expression (bits sliced out of the `ws` word array).
    */
  private def mihGeometry(words: Seq[String], tau: Int, nChunks: Int)
      : (Seq[Seq[Long]], Int => Column) = {
    val bits   = words.length * 32
    val radius = tau / nChunks
    require(nChunks * (radius + 1) > tau,
      s"pigeonhole violated: $nChunks chunks at radius $radius cover only " +
        s"${nChunks * (radius + 1) - 1} < tau=$tau")
    val starts = (0 to nChunks).map(c => c * bits / nChunks)
    val maskArrays: Seq[Seq[Long]] =
      (0 until nChunks).map(c => masksUpTo(starts(c + 1) - starts(c), radius))
    def keyExpr(c: Int): Column = expr(
      s"aggregate(sequence(${starts(c)}, ${starts(c + 1) - 1}), 0L, " +
        "(acc, j) -> acc + IF((shiftright(element_at(ws, " +
        "CAST(j div 32 + 1 AS INT)), CAST(j % 32 AS INT)) & 1) = 1, " +
        s"shiftleft(1L, CAST(j - ${starts(c)} AS INT)), 0L))")
    (maskArrays, keyExpr)
  }

  private def chunkKeysOf(codes: DataFrame, words: Seq[String],
      nChunks: Int, keyExpr: Int => Column): DataFrame =
    codes.withColumn("ws", array(words.map(col): _*))
      .select(col("vec_id"),
        posexplode(array((0 until nChunks).map(keyExpr): _*))
          .as(Seq("c", "key")))

  private[graft] def mihPairsChunked(codes: DataFrame, words: Seq[String],
      tau: Int, nChunks: Int): DataFrame = {
    val (maskArrays, keyExpr) = mihGeometry(words, tau, nChunks)
    val ch = chunkKeysOf(codes, words, nChunks, keyExpr)
    val probes = ch
      .select(col("vec_id").as("v1"), col("c"), col("key"),
        explode(element_at(typedlit(maskArrays), col("c") + 1)).as("m"))
      .select(col("v1"), col("c"), col("key").bitwiseXOR(col("m")).as("pkey"))
    // same SHUFFLE_HASH rationale as mihPairs: the exploded probe side's
    // stats are underestimated; pin the shuffled hash join
    val cand = probes.join(
        ch.select(col("vec_id").as("v2"), col("c"), col("key").as("pkey"))
          .hint("SHUFFLE_HASH"),
        Seq("c", "pkey"))
      .filter(col("v1") < col("v2"))
      .select("v1", "v2").distinct()
    val a = codes.select(
      col("vec_id").as("v1") +: words.map(w => col(w).as(s"${w}1")): _*)
    val b = codes.select(
      col("vec_id").as("v2") +: words.map(w => col(w).as(s"${w}2")): _*)
    cand.join(a, "v1").join(b, "v2")
      .select(col("v1"), col("v2"),
        expr(words.map(w => s"bit_count(${w}1 ^ ${w}2)").mkString(" + "))
          .cast("int").as("ham"))
      .filter(col("ham") <= tau)
  }

  /** OR-of-families MIH candidates (round 16): one fused engine pass for a
    * query that needs pairs close under ANY of several same-width code
    * families (q_hash_agreement ran the full engine TWICE — two probe
    * explodes, two shuffled joins, two distincts — then unioned). Chunk
    * ids are offset per family (family t owns chunks [t·n, t·n+n)), so a
    * single (chunk, key) join carries every family's collisions; the
    * pigeonhole contract holds per family exactly as in
    * [[mihPairsChunked]], hence any pair within `tau` under family t
    * collides on one of t's probed chunks and the union of collisions
    * covers the OR-predicate. Candidates only — the caller applies its
    * exact Hamming filter (output therefore identical to unioning the
    * per-family engines; the brute-force oracle re-proves completeness).
    */
  private[graft] def mihPairsChunkedOrCandidates(codes: DataFrame,
      families: Seq[Seq[String]], tau: Int, nChunks: Int): DataFrame = {
    require(families.map(_.length).distinct.size == 1,
      "OR-families must share one code width")
    val (maskArrays, keyExpr) = mihGeometry(families.head, tau, nChunks)
    val ch = families.zipWithIndex.map { case (words, t) =>
      chunkKeysOf(codes, words, nChunks, keyExpr)
        .select(col("vec_id"), (col("c") + lit(t * nChunks)).as("c"),
          col("key"))
    }.reduce(_ unionByName _)
    val probes = ch
      .select(col("vec_id").as("v1"), col("c"), col("key"),
        explode(element_at(typedlit(maskArrays),
          pmod(col("c"), lit(nChunks)).cast("int") + 1)).as("m"))
      .select(col("v1"), col("c"), col("key").bitwiseXOR(col("m")).as("pkey"))
    // same SHUFFLE_HASH rationale as mihPairs: exploded-side stats are
    // underestimated; pin the shuffled hash join
    probes.join(
        ch.select(col("vec_id").as("v2"), col("c"), col("key").as("pkey"))
          .hint("SHUFFLE_HASH"),
        Seq("c", "pkey"))
      .filter(col("v1") < col("v2"))
      .select("v1", "v2").distinct()
  }

  /** Cross-frame MIH: every (probe, index) pair within Hamming `tau`,
    * NOT a self-join — the ingest-vs-frozen-index shape. Probe rows
    * explode into per-chunk Hamming-ball keys and meet the index's plain
    * chunk keys on (chunk, key); pigeonhole (radius = τ div chunks)
    * guarantees every true pair collides on some probed chunk, and the
    * exact Hamming filter closes. Scale: Θ(probes·chunks·masks) probe
    * rows against an index partitioned once on (chunk, key) — the probe
    * side is the (small) ingest batch, so per-trigger cost is
    * batch-proportional, never index².
    */
  private[graft] def mihJoinChunked(probe: DataFrame, index: DataFrame,
      words: Seq[String], tau: Int, nChunks: Int): DataFrame = {
    val (maskArrays, keyExpr) = mihGeometry(words, tau, nChunks)
    val probes = chunkKeysOf(probe, words, nChunks, keyExpr)
      .select(col("vec_id").as("p_id"), col("c"), col("key"),
        explode(element_at(typedlit(maskArrays), col("c") + 1)).as("m"))
      .select(col("p_id"), col("c"), col("key").bitwiseXOR(col("m")).as("pkey"))
    // same SHUFFLE_HASH rationale as mihPairs: exploded-side stats are
    // underestimated; pin the shuffled hash join
    val cand = probes.join(
        chunkKeysOf(index, words, nChunks, keyExpr)
          .select(col("vec_id").as("i_id"), col("c"), col("key").as("pkey"))
          .hint("SHUFFLE_HASH"),
        Seq("c", "pkey"))
      .select("p_id", "i_id").distinct()
    val a = probe.select(
      col("vec_id").as("p_id") +: words.map(w => col(w).as(s"${w}1")): _*)
    val b = index.select(
      col("vec_id").as("i_id") +: words.map(w => col(w).as(s"${w}2")): _*)
    cand.join(a, "p_id").join(b, "i_id")
      .select(col("p_id"), col("i_id"),
        expr(words.map(w => s"bit_count(${w}1 ^ ${w}2)").mkString(" + "))
          .cast("int").as("ham"))
      .filter(col("ham") <= tau)
  }

  /** Buckets probed per hash table by the ANN query (query-directed). */
  final val AnnProbes = 4
  /** Partial-dot screen: dims scored in stage 1, shortlist = 1/ScreenDen. */
  final val ScreenDims = 24
  final val ScreenDen  = 5

  /** Deterministic pseudo-random hyperplanes derived from PolyHash —
    * reproducible across engines/sessions without an RNG. One independent
    * plane set per hash table (multi-table LSH: a true neighbor only needs
    * to share a bucket in ONE table). Plane (table, j) is independent of
    * how many planes a configuration uses, so parameter sweeps reuse them.
    */
  private[ops] def planes(table: Int, numPlanes: Int = NumPlanes): Seq[Array[Float]] =
    (0 until numPlanes).map { j =>
      Array.tabulate(Dim) { i =>
        val h = Hashing.polyHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"plane:$table:$j:$i"))
        ((h % 2001L) - 1000L).toFloat / 1000.0f
      }
    }

  /** Sign-bit LSH bucket id of an embedding column under one table's planes. */
  private[ops] def bucket(v: Column, table: Int, numPlanes: Int = NumPlanes): Column =
    (0 until numPlanes).map { j =>
      when(dot_ff(v, typedlit(planes(table, numPlanes)(j).toSeq)) > 0d, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot_ff(col("embedding"), col("embedding"))))

  /** Probe-batch row cap — the structural bound that makes the broadcast
    * hint on the probe side safe BY CONSTRUCTION at any corpus size.
    */
  final val MaxProbeBatch = 1024

  /** The probe batch every top-k/ANN query looks up: fixture membership is
    * `vec_id % 100 = 0` (deterministic, so the DuckDB oracle reproduces the
    * set), and the deterministic orderBy+limit caps it at [[MaxProbeBatch]]
    * rows IN THE PLAN (GlobalLimit — PlanShapeSpec asserts it under every
    * probe-side broadcast hint). In production the probe batch is a bounded
    * external lookup input; this makes the fixture shape carry the same
    * guarantee instead of relying on `% 100` staying corpus-proportional.
    */
  private def probeBatch(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 100 === 0).orderBy("vec_id").limit(MaxProbeBatch)

  /** Exact cosine top-k (k=10) for probes vec_id % 100 = 0.
    *
    * Exact top-k over unindexed vectors is inherently a full scan of the
    * candidate side — but it does NOT have to materialize or shuffle the
    * scored pairs. Probes broadcast to the candidate partitions, and a
    * typed [[graft.functions.TopKAgg]] keeps a k-element buffer per probe
    * in each map task (partial aggregation), so the only shuffle is
    * O(partitions × probes × k) buffer rows. The earlier formulation —
    * `row_number() OVER (PARTITION BY p_id)` over all N×P scored pairs —
    * shuffled every pair to rank them; this one never lets the pair set
    * leave the map side. (Sub-scan candidate generation is the ANN path:
    * [[annLshTopK]] / q_cosine_topk_ann.)
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame =
    cosineTopKFrom(Tables.embeddings(s, dir))

  /** (p_id, cos_r, c_id) → exact per-probe top-10 with dense rank columns,
    * via partial top-k aggregation (see [[cosineTopK]]).
    */
  private[graft] def rankTopK(scored: DataFrame): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(10))
    scored
      .groupBy("p_id").agg(topk(col("cos_r"), col("c_id")).as("tk"))
      .select(col("p_id"),
        posexplode(arrays_zip(col("tk.cs"), col("tk.ids"))).as(Seq("pos", "z")))
      .select(col("p_id"), (col("pos") + 1).cast("int").as("rank"),
        col("z.ids").as("c_id"), col("z.cs").as("cos_r"))
      .orderBy("p_id", "rank")
  }

  /** LSH-bucketed scored candidates (p_id, cos_r, c_id) with QUERY-DIRECTED
    * multiprobe (Lv et al., "Multi-Probe LSH", VLDB 2007): per hash table a
    * probe searches `probesPerTable` buckets — its own, then the buckets
    * reached by flipping the sign bits with the SMALLEST margin
    * |dot(p, plane)| (a near-zero margin means the true neighbors are
    * likely on the other side of exactly that plane). That recovers most
    * of blind ±1/±2-bit probing's recall at a fraction of the buckets.
    *
    * At scale the (table, bucket) join replaces a brute-force cross join —
    * shuffle keys are small ints; embeddings never shuffle (candidates
    * explode to narrow (tbl, bkt) rows, probes are broadcast-sized).
    */
  private[graft] def lshScored(s: SparkSession, dir: String,
      numTables: Int, numPlanes: Int, probesPerTable: Int): DataFrame =
    lshScoredFrom(Tables.embeddings(s, dir), numTables, numPlanes, probesPerTable)

  /** [[lshScored]] over an explicit (vec_id, embedding) frame — lets the
    * clustered-fixture recall gate (QueriesSpec) drive the same operator.
    */
  private[graft] def lshScoredFrom(emb: DataFrame,
      numTables: Int, numPlanes: Int, probesPerTable: Int): DataFrame = {
    val e = withNorm(emb)
      .withColumn("bkts", array((0 until numTables).map(t =>
        bucket(col("embedding"), t, numPlanes)): _*))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), posexplode(col("bkts")).as(Seq("tbl", "bkt")))
    val pow2 = typedlit((0 until numPlanes).map(1 << _))
    // per table: flip masks in ascending |margin| order — single bits of
    // the 1st/2nd/3rd-closest planes, then the pair of the two closest
    def flipMasks(t: Int): Column = {
      val dots = array((0 until numPlanes).map(j =>
        dot_ff(col("embedding"), typedlit(planes(t, numPlanes)(j).toSeq))): _*)
      val byMargin = transform(
        array_sort(transform(sequence(lit(0), lit(numPlanes - 1)), j =>
          struct(abs(element_at(dots, j + 1)).as("m"), j.as("j")))),
        x => x("j"))
      val b1 = element_at(pow2, element_at(byMargin, 1) + 1)
      val b2 = element_at(pow2, element_at(byMargin, 2) + 1)
      val b3 = element_at(pow2, element_at(byMargin, 3) + 1)
      array(Seq(lit(0), b1, b2, b1.bitwiseOR(b2), b3,
        b1.bitwiseOR(b3)).take(probesPerTable): _*)
    }
    val probeBuckets = flatten(array((0 until numTables).map { t =>
      val b = element_at(col("bkts"), t + 1)
      transform(flipMasks(t), m => struct(lit(t).as("tbl"),
        b.bitwiseXOR(m).as("bkt")))
    }: _*))
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"), col("nrm").as("pn"),
        explode(probeBuckets).as("tb"))
      .select(col("p_id"), col("pv"), col("pn"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
    cands.join(probes, Seq("tbl", "bkt"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), cosR.as("cos_r"), col("c_id"))
      .distinct() // a pair can match via several probed buckets/tables
  }

  /** [[lshScoredFrom]] at the calibration's MAX probe budget, each distinct
    * candidate pair tagged with the smallest 0-based flip-mask index `mi`
    * that reaches it. Because a setting's probed buckets are a PREFIX of
    * the flip-mask list (the nesting property the sweep rests on),
    * `lshScoredFrom(emb, T, P, p)`'s distinct pair set is EXACTLY the
    * `mi < p` subset of this frame — one bucket join carries the whole
    * LshSweep instead of one join per setting. cos_r is a pure function of
    * the pair, so `max` over a pair's matches is the (identical) value the
    * per-setting `.distinct()` kept.
    */
  private[graft] def lshTaggedFrom(emb: DataFrame, numTables: Int,
      numPlanes: Int, maxProbes: Int): DataFrame = {
    val e = withNorm(emb)
      .withColumn("bkts", array((0 until numTables).map(t =>
        bucket(col("embedding"), t, numPlanes)): _*))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), posexplode(col("bkts")).as(Seq("tbl", "bkt")))
    val pow2 = typedlit((0 until numPlanes).map(1 << _))
    def flipMasks(t: Int): Column = {
      val dots = array((0 until numPlanes).map(j =>
        dot_ff(col("embedding"), typedlit(planes(t, numPlanes)(j).toSeq))): _*)
      val byMargin = transform(
        array_sort(transform(sequence(lit(0), lit(numPlanes - 1)), j =>
          struct(abs(element_at(dots, j + 1)).as("m"), j.as("j")))),
        x => x("j"))
      val b1 = element_at(pow2, element_at(byMargin, 1) + 1)
      val b2 = element_at(pow2, element_at(byMargin, 2) + 1)
      val b3 = element_at(pow2, element_at(byMargin, 3) + 1)
      array(Seq(lit(0), b1, b2, b1.bitwiseOR(b2), b3,
        b1.bitwiseOR(b3)).take(maxProbes): _*)
    }
    val probeBuckets = flatten(array((0 until numTables).map { t =>
      val b = element_at(col("bkts"), t + 1)
      transform(flipMasks(t), (m, i) => struct(lit(t).as("tbl"),
        b.bitwiseXOR(m).as("bkt"), i.as("mi")))
    }: _*))
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"), col("nrm").as("pn"),
        explode(probeBuckets).as("tb"))
      .select(col("p_id"), col("pv"), col("pn"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"), col("tb.mi").as("mi"))
    val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
    cands.join(probes, Seq("tbl", "bkt"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"), col("mi"), cosR.as("cos_r"))
      .groupBy("p_id", "c_id")
      .agg(min("mi").as("mi"), max("cos_r").as("cos_r"))
  }

  /** ANN top-k: same contract as [[cosineTopK]], approximate recall.
    * Not oracle-checked (bucket recall is approximate); ScalaTest measures
    * recall vs brute force.
    */
  def annLshTopK(s: SparkSession, dir: String): DataFrame =
    rankTopK(lshScored(s, dir, NumTables, NumPlanes, AnnProbes))

  /** Two-stage screen + exact re-rank ANN: a cheap partial dot product
    * over the first [[ScreenDims]] dimensions scores every candidate
    * (⅜ the FLOPs of the full 64-dim scan and, like [[cosineTopK]],
    * aggregated map-side so no scored pair ever shuffles); only the
    * per-probe top-1/[[ScreenDen]] shortlist is re-ranked with the exact
    * 64-dim cosine.
    *
    * Honest cost/recall accounting on THIS corpus (isotropic vectors,
    * top-10 cosines ≈ 0.4 against noise ≈ 0, measured at sf0.01):
    * the partial dot correlates ~√(24/64) ≈ 0.6 with the full dot and
    * buys recall@10 = 0.82 at 20% fully-scored candidates, where sign-bit
    * LSH — even query-directed multiprobe — stays pinned near its
    * candidate fraction (≈0.5 recall at 33%). LSH ([[annLshTopK]]) remains
    * the sub-scan lookup shape for corpora with real cluster structure;
    * the screen is the right tool when vectors are unstructured.
    */
  def screenTopK(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    // shortlist size from the table's row count (parquet metadata read)
    val n = Tables.embeddings(s, dir).count()
    val m = math.max(10L, (n - 1 + ScreenDen - 1) / ScreenDen).toInt
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"), col("nrm").as("pn"))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"))
    val pdot = dot_ff(slice(col("cv"), 1, ScreenDims), slice(col("pv"), 1, ScreenDims))
    val screen = udaf(new graft.functions.TopKAgg(m))
    val shortlist = cands
      .join(broadcast(probes.select("p_id", "pv")), col("p_id") =!= col("c_id"))
      .select(col("p_id"), pdot.as("pd"), col("c_id"))
      .groupBy("p_id").agg(screen(col("pd"), col("c_id")).as("tk"))
      .select(col("p_id"), explode(col("tk.ids")).as("c_id"))
    val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
    val scored = shortlist
      .join(cands, "c_id")
      .join(broadcast(probes), "p_id")
      .select(col("p_id"), cosR.as("cos_r"), col("c_id"))
    rankTopK(scored)
  }

  /** Shortlist size per probe for the exact-pruned path's bound stage. */
  final val BoundShortlist = 64

  /** PROVABLY-EXACT top-k without full-scoring every pair — the
    * FAISS-style "refine with a bound" shape, answering the exact contract
    * (same oracle SQL as q_cosine_topk, hash-equal output) while fully
    * scoring only a fraction of candidates:
    *
    *  1. Bound stage: per probe, exact-score only the [[BoundShortlist]]
    *     best candidates BY PARTIAL DOT (first [[ScreenDims]] dims,
    *     aggregated map-side). The kth exact cosine of ANY candidate
    *     subset is a valid lower bound L_p of the true kth value (the
    *     full set's kth-largest can only be larger).
    *  2. Prune stage: for every pair, Cauchy–Schwarz bounds the unseen
    *     tail: cos ≤ (headDot + ‖p_tail‖·‖c_tail‖) / (‖p‖·‖c‖). Pairs
    *     whose upper bound misses L_p (minus a 1e-6 slack covering the
    *     6-dp ranking round) cannot be in the true top-k and are never
    *     fully scored.
    *  3. Exact re-rank of the survivors (the only full 64-dim dots).
    *
    * Every true top-k member survives step 2 by construction → the result
    * EQUALS brute force (asserted cell-for-cell in QueriesSpec and by the
    * shared DuckDB oracle). WHEN the bound bites is a property of the
    * data: it prunes pairs with upper < L_p, i.e. it needs the kth true
    * cosine to clear the tail-norm product (≈ √(tail dims / 64) on
    * isotropic vectors). On THIS test corpus the measured kth ≈ 0.26
    * barely exceeds the noise floor, so the bound keeps nearly all pairs
    * — the same no-free-lunch already measured for LSH and IVF here — but
    * on clustered corpora (kth ≈ 0.9, the realistic near-dup regime)
    * the identical operator prunes the bulk of the scan. Measured:
    * isotropic test vectors 2483/2495 pairs fully scored (99.5%);
    * constructed 40-cluster vectors 173/9990 (1.7% — 98.3% of full dots
    * never happen), both exact — asserted in QueriesSpec.
    *
    * Honest FLOPs accounting: the saving counts FULL 64-dim dots only.
    * The 24-dim partial dot runs over every pair TWICE (once feeding the
    * bound aggregation, once in the prune pass — the lazy DAG recomputes
    * rather than cache an N×P frame), so total multiply work is
    * ≥ 2·(24/64) = 75% of brute force even at perfect pruning; the real
    * win at scale is that survivors — the only rows that carry full
    * embeddings through the re-rank — shrink to the probes'
    * neighborhoods.
    */
  def cosineTopKPruned(s: SparkSession, dir: String): DataFrame =
    rankTopK(prunedSurvivorsFrom(Tables.embeddings(s, dir)))

  /** Int8 scalar quantization (symmetric, fixed scale 127): each float
    * coordinate snaps to micro units once (the integer-cents rule), then
    * rescales to [−127, 127] by exact integer arithmetic —
    * `q = clamp((round(x·10⁶) · 127) div 10⁶)` with toward-zero division
    * (Spark `div` ≡ DuckDB `//` — both truncate). Nothing float survives
    * the quantizer, so the quantized plane is cross-engine EXACT: unlike
    * the recall-gated float ANN family, quantized retrieval here is
    * oracle-checkable hash-for-hash.
    */
  private[graft] def sqQuantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> greatest(-127L, least(127L, " +
        "(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) * 127) div 1000000)))")
        .as("qv"))

  /** Scalar-quantized maximum-inner-product top-k (q_sq_topk): the int8
    * serving shape of vector retrieval — 8× smaller vectors than float32,
    * integer dot products (SIMD-friendly on real hardware), the same
    * probe-broadcast + partial top-k plan as [[cosineTopK]] (shuffle is
    * O(partitions × probes × k), never N×P). Scores are exact BIGINT
    * inner products over the quantized codes (≤ 64·127² ≈ 2^20, exactly
    * representable in the aggregator's double buffer), ranked
    * (dot_q DESC, c_id). QueriesSpec bridges to the float contract:
    * recall@10 vs exact cosine ≥ 0.85 on the shipped corpus (measured
    * 0.96 / 0.92 at sf0.01 / sf0.1).
    */
  def sqTopK(s: SparkSession, dir: String): DataFrame =
    sqTopKFrom(Tables.embeddings(s, dir))

  private[graft] def sqTopKFrom(emb: DataFrame): DataFrame = {
    val q      = sqQuantized(emb)
    val probes = probeBatch(q).select(col("vec_id").as("p_id"), col("qv").as("pq"))
    val cands  = q.select(col("vec_id").as("c_id"), col("qv").as("cq"))
    rankTopK(cands.join(broadcast(probes), col("p_id") =!= col("c_id"))
        .select(col("p_id"), dot_ll(col("pq"), col("cq")).cast("double").as("cos_r"),
          col("c_id")))
      .select(col("p_id"), col("rank"), col("c_id"),
        col("cos_r").cast("long").as("dot_q"))
  }

  /** Brute-force twin over an explicit (vec_id, embedding) frame — the
    * equality baseline for [[prunedSurvivorsFrom]] on constructed data.
    */
  private[graft] def cosineTopKFrom(emb: DataFrame): DataFrame = {
    val e = withNorm(emb)
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"), col("nrm").as("pn"))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"))
    val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
    rankTopK(cands.join(broadcast(probes), col("p_id") =!= col("c_id"))
      .select(col("p_id"), cosR.as("cos_r"), col("c_id")))
  }

  private[graft] def prunedSurvivorsFrom(emb: DataFrame,
      shortlist: Int = BoundShortlist): DataFrame = {
    val e = withNorm(emb)
      .withColumn("hv", slice(col("embedding"), 1, ScreenDims))
      .withColumn("tn", sqrt(dot_ff(
        slice(col("embedding"), ScreenDims + 1, Dim - ScreenDims),
        slice(col("embedding"), ScreenDims + 1, Dim - ScreenDims))))
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
        col("nrm").as("pn"), col("hv").as("phv"), col("tn").as("ptn"))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), col("hv"), col("tn"))
    val pairs = cands.join(broadcast(probes), col("p_id") =!= col("c_id"))
    val headDot = dot_ff(col("phv"), col("hv"))
    val cosR    = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)

    // 1. lower bound: kth exact cosine among the partial-dot shortlist
    val short = udaf(new graft.functions.TopKAgg(shortlist))
    val exact10 = udaf(new graft.functions.TopKAgg(10))
    val bound = pairs
      .select(col("p_id"), headDot.as("pd"), col("c_id"))
      .groupBy("p_id").agg(short(col("pd"), col("c_id")).as("tk"))
      .select(col("p_id"), explode(col("tk.ids")).as("c_id"))
      .join(cands, "c_id").join(broadcast(probes), "p_id")
      .select(col("p_id"), cosR.as("cos_r"), col("c_id"))
      .groupBy("p_id").agg(exact10(col("cos_r"), col("c_id")).as("tk"))
      // fewer than 10 shortlisted → no usable bound → keep everything
      .select(col("p_id"), when(size(col("tk.cs")) >= 10,
        element_at(col("tk.cs"), size(col("tk.cs")))).otherwise(-2.0).as("lb"))

    // 2 + 3. prune by the tail bound, then exact-score survivors only
    val upper = (headDot + col("ptn") * col("tn")) / (col("pn") * col("cn"))
    pairs.join(broadcast(bound), "p_id")
      .filter(upper >= col("lb") - 1e-6)
      .select(col("p_id"), cosR.as("cos_r"), col("c_id"))
  }

  final val IvfCells  = 16
  final val IvfProbes = 4
  final val IvfIters  = 2

  /** Every `TrainSampleMod`-th vector trains the quantizer. */
  final val TrainSampleMod = 3

  /** k-means-lite (Lloyd) centroids over a deterministic SAMPLE of the
    * embedding column (every [[TrainSampleMod]]-th vec_id — no RNG, so runs
    * are reproducible): quantizer training only needs enough points to
    * place k centroids, so at 100 TB the Lloyd rounds run over a fixed-size
    * sample while the full corpus is only ever touched by the one narrow
    * assignment pass. Model state is k×64 floats — it is SUPPOSED to live
    * on the driver and broadcast back as literals each round (the standard
    * Lloyd layout: assignment is a narrow map over broadcast centroids,
    * update is one groupBy(cell)); this is model-state collect, not data
    * collect — the collected frame is O(k·dim) regardless of corpus size.
    */
  private[graft] def kmeansCentroids(s: SparkSession, dir: String,
      k: Int = IvfCells, iters: Int = IvfIters): Array[Array[Double]] =
    kmeansCentroidsFrom(Tables.embeddings(s, dir), k, iters)

  /** [[kmeansCentroids]] over an explicit (vec_id, embedding) frame. */
  private[graft] def kmeansCentroidsFrom(emb: DataFrame,
      k: Int = IvfCells, iters: Int = IvfIters): Array[Array[Double]] = {
    val e = emb.filter(col("vec_id") % TrainSampleMod === 0)
    // a tiny corpus can sample fewer than k vectors: clamp the cell count
    // to what the sample provides (downstream sizes itself off the
    // returned array, so fewer cells just means coarser partitioning)
    var cents: Array[Array[Double]] = e.orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val kEff = cents.length
    require(kEff > 0, "IVF quantizer needs at least one training vector")
    for (_ <- 0 until iters) {
      // one aggregation per round: collect the k×dim (cell, pos, mean)
      // rows and assemble centroid arrays driver-side — the second
      // groupBy(cell)+collect_list pass would be a whole extra shuffle
      // just to reshape O(k·dim) rows the driver holds anyway
      val means = e
        .select(cellOf(col("embedding"), cents).as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
      val next = Array.tabulate(kEff)(i => cents(i).clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // an emptied cell keeps its previous centroid (its slots untouched)
      cents = next
    }
    cents
  }

  /** Nearest-centroid cell id (argmax cosine; ties → lowest cell). */
  private[graft] def cellOf(v: Column, cents: Array[Array[Double]]): Column = {
    val scores = centScores(v, cents)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Per-centroid cosine scores of `v` (centroid norms folded in driver-side). */
  private def centScores(v: Column, cents: Array[Array[Double]]): Column =
    array(cents.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      dot_ff(v, typedlit(c.map(_.toFloat).toSeq)) / lit(if (n == 0) 1.0 else n)
    }: _*)

  /** The `nprobe` best cells for a probe vector, best-first. The cell
    * lists NEST across nprobe settings (same best-first order sliced
    * shorter/longer) — the structural fact the calibration sweep's
    * monotonicity rests on.
    */
  private[graft] def probeCells(v: Column, cents: Array[Array[Double]],
      nprobe: Int = IvfProbes): Column = {
    val scores = centScores(v, cents)
    slice(transform(
      array_sort(transform(sequence(lit(0), lit(cents.length - 1)), i =>
        struct((-element_at(scores, i + 1)).as("s"), i.as("i")))),
      x => x("i").cast("int")), 1, nprobe)
  }

  /** IVF (inverted-file) ANN top-k: k-means-lite coarse quantizer, each
    * vector indexed under its nearest centroid's cell, probes scan their
    * [[IvfProbes]]-of-[[IvfCells]] nearest cells — the third ANN shape
    * (cell join ≈ LSH's bucket join, but cells are LEARNED from the data,
    * so on clustered corpora recall concentrates far above the candidate
    * fraction; on these isotropic test vectors it, like LSH, tracks the
    * scanned fraction — measured and asserted in QueriesSpec). At 100 TB:
    * assignment is a narrow map (centroids broadcast), the index is a
    * plain int column (re-usable across queries; partition/bucket by it
    * for locality), and a probe's cost is the probed cells' rows only.
    */
  def annIvfTopK(s: SparkSession, dir: String): DataFrame =
    annIvfTopKFrom(Tables.embeddings(s, dir))

  /** [[annIvfTopK]] over an explicit (vec_id, embedding) frame. */
  private[graft] def annIvfTopKFrom(emb: DataFrame): DataFrame = {
    val cents = kmeansCentroidsFrom(emb)
    annIvfTopKIndexed(ivfAssign(emb, cents), cents)
  }

  /** The IVF query over an ALREADY-INDEXED frame (vec_id, embedding, cell)
    * — the serving path once the index exists, shared by the train-once
    * query above and the incrementally-appended index below.
    */
  private[graft] def annIvfTopKIndexed(indexed: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    rankTopK(ivfScored(indexed, cents, IvfProbes))

  /** The IVF candidate-scoring stage at an explicit nprobe — the swept
    * knob of the calibration curve.
    */
  private[graft] def ivfScored(indexed: DataFrame,
      cents: Array[Array[Double]], nprobe: Int): DataFrame = {
    val e = withNorm(indexed)
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), col("cell"))
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"), col("nrm").as("pn"),
        explode(probeCells(col("embedding"), cents, nprobe)).as("cell"))
    val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
    // each candidate lives in exactly ONE cell → no pair dedup needed
    cands.join(probes, Seq("cell"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), cosR.as("cos_r"), col("c_id"))
  }

  // ---- ANN calibration sweep ------------------------------------------

  /** Swept knob values per ANN family. Each family's candidate sets NEST
    * across settings (probeCells slices one best-first cell order; the
    * LSH flip-mask list is a prefix take; TopKAgg shortlists are prefixes
    * of one pd order), so recall / candidate count are STRUCTURALLY
    * monotone in the knob — the property QueriesSpec gates.
    */
  final val IvfSweep    = Seq(1, 2, 4, 8, 16)
  final val LshSweep    = Seq(1, 2, 4, 6)
  final val ScreenSweep = Seq(16, 64, 256)

  /** Measured recall-vs-candidates calibration curves for the ANN family —
    * the q_minhash_calibration pattern applied to vector search, making
    * the recall-gated (⊘) queries self-documenting: one row per
    * (family, setting) with the exact scored-candidate count, its
    * fraction of the brute-force pair space (micro units), and recall@10
    * against the exact cosine ranking (micro units). The exact top-k
    * ground truth is collected ONCE as bounded model state (≤ probes×10
    * rows — the probe batch is GlobalLimit-capped) and joined back as a
    * literal frame, so the 12 swept settings never recompute it. The IVF
    * row at nprobe = IvfCells scans every cell — its recall is exactly
    * 10⁶ by construction, a built-in self-check; the screen family is
    * exact at every shortlist (recall ≡ 10⁶), its knob trades CANDIDATE
    * work instead. Scale shape: each setting is one cell/bucket join +
    * two O(1)-row aggregates; nothing corpus-sized leaves the executors.
    */
  def annCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val exactRows = cosineTopKFrom(emb).select("p_id", "c_id")
      .as[(Long, Long)].collect()
    val exactLit = exactRows.toSeq.toDF("p_id", "c_id")
    // Guard like denom below: an empty probe batch (nExact = 0) must not
    // turn the recall column into silent NULLs via div-by-zero.
    val nExact   = math.max(exactRows.length.toLong, 1L)
    val nVec     = emb.count()
    val nProbes  = exactRows.map(_._1).distinct.length.toLong
    val denom    = math.max(nProbes * (nVec - 1), 1L)

    val cents   = kmeansCentroidsFrom(emb)
    val indexed = ivfAssign(emb, cents)

    val topk10 = udaf(new graft.functions.TopKAgg(10))

    // SINGLE-PASS SWEEPS: each family's candidate sets NEST across its
    // settings (the structural property documented on IvfSweep and gated
    // by QueriesSpec), so ONE candidate join at the largest setting, with
    // each row tagged by the smallest setting that includes it, carries
    // the entire sweep — instead of one full join + two aggregations PER
    // setting (12 independent subtrees re-scanning the embeddings; the
    // round-15 before-plan held 244 Exchanges / 144 parquet scans).
    // Per-setting top-10s come from merging per-tag partial top-10s:
    // TopKAgg ordering is (cos DESC, id ASC) — deterministic and
    // order-independent — so top-10(∪ tags ≤ p) = top-10 of the merged
    // per-tag top-10s, exactly the per-setting rankTopK result.
    // AnnCalibrationSpec proves row equality vs the per-setting reference.

    // perBucket: (p_id, sets: array<setting>, cnt, tk = per-bucket top-10)
    def familyCurve(family: String, settings: Seq[Int],
        perBucket: DataFrame): DataFrame = {
      val bySet = perBucket.select(col("p_id"),
        explode(col("sets")).as("setting"), col("cnt"), col("tk"))
      val nCand = bySet.groupBy("setting").agg(sum("cnt").as("n_cand"))
      val nHit = bySet
        .select(col("setting"), col("p_id"),
          explode(arrays_zip(col("tk.cs"), col("tk.ids"))).as("z"))
        .select(col("setting"), col("p_id"),
          col("z.cs").as("cos_r"), col("z.ids").as("c_id"))
        .groupBy("setting", "p_id")
        .agg(topk10(col("cos_r"), col("c_id")).as("tk"))
        .select(col("setting"), col("p_id"), explode(col("tk.ids")).as("c_id"))
        .join(broadcast(exactLit), Seq("p_id", "c_id"))
        .groupBy("setting").agg(count(lit(1)).as("n_hit"))
      // literal (family, setting) base: a zero-candidate setting must
      // still emit its row, as the per-setting agg-without-groupBy did
      val base = settings.map(p => (family, p)).toDF("family", "setting")
      base.join(nCand, Seq("setting"), "left")
        .join(nHit, Seq("setting"), "left")
        .select(col("family"), col("setting"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .select(col("family"), col("setting"), col("n_cand"),
          expr(s"n_cand * 1000000 div $denom").as("cand_frac_micro"),
          expr(s"n_hit * 1000000 div $nExact").as("recall10_micro"))
    }

    // IVF: probe cells rank-tagged at nprobe = max; setting p's scored
    // multiset = rows with probe rank < p (probeCells slices ONE
    // best-first cell order).
    val ivfPerBucket = {
      val e = withNorm(indexed)
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
        col("nrm").as("cn"), col("cell"))
      val probes = probeBatch(e)
        .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
          col("nrm").as("pn"),
          posexplode(probeCells(col("embedding"), cents, IvfSweep.max))
            .as(Seq("pr", "cell")))
      val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
      cands.join(probes, Seq("cell"))
        .filter(col("p_id") =!= col("c_id"))
        .select(col("p_id"), col("pr"), cosR.as("cos_r"), col("c_id"))
        .groupBy("p_id", "pr")
        .agg(topk10(col("cos_r"), col("c_id")).as("tk"), count(lit(1)).as("cnt"))
        .withColumn("sets",
          filter(typedlit(IvfSweep), p => p >= col("pr") + 1))
    }

    // LSH: one bucket join at probesPerTable = max, pairs tagged with the
    // smallest reaching flip-mask index (lshTaggedFrom).
    val lshPerBucket = lshTaggedFrom(emb, NumTables, NumPlanes, LshSweep.max)
      .groupBy("p_id", "mi")
      .agg(topk10(col("cos_r"), col("c_id")).as("tk"), count(lit(1)).as("cnt"))
      .withColumn("sets",
        filter(typedlit(LshSweep), p => p >= col("mi") + 1))

    // Screen: ONE shortlist ranking at the max shortlist (TopKAgg's
    // deterministic order makes every smaller shortlist its prefix), one
    // per-setting lower-bound frame off that ranking, then ONE pass over
    // the pair space computing each row's qualifying settings directly
    // (upper-bound filter per setting) — vs 3×(bound pass + filter pass).
    val scrPerBucket = {
      val e = withNorm(emb)
        .withColumn("hv", slice(col("embedding"), 1, ScreenDims))
        .withColumn("tn", sqrt(dot_ff(
          slice(col("embedding"), ScreenDims + 1, Dim - ScreenDims),
          slice(col("embedding"), ScreenDims + 1, Dim - ScreenDims))))
      val probes = probeBatch(e)
        .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
          col("nrm").as("pn"), col("hv").as("phv"), col("tn").as("ptn"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
        col("nrm").as("cn"), col("hv"), col("tn"))
      val pairs = cands.join(broadcast(probes), col("p_id") =!= col("c_id"))
      val headDot = dot_ff(col("phv"), col("hv"))
      val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
      val shortMax = udaf(new graft.functions.TopKAgg(ScreenSweep.max))
      val shortScored = pairs
        .select(col("p_id"), headDot.as("pd"), col("c_id"))
        .groupBy("p_id").agg(shortMax(col("pd"), col("c_id")).as("tk"))
        .select(col("p_id"), posexplode(col("tk.ids")).as(Seq("pos0", "c_id")))
        .join(cands, "c_id").join(broadcast(probes), "p_id")
        .select(col("p_id"), col("pos0"), cosR.as("cos_r"), col("c_id"))
      // lb(sl) = 10th-best exact cosine among the top-sl shortlist
      // (-2.0 when fewer than 10 — keeps everything, as before)
      val lbMap = shortScored
        .select(col("p_id"),
          explode(filter(typedlit(ScreenSweep), sl => sl > col("pos0")))
            .as("sl"),
          col("cos_r"), col("c_id"))
        .groupBy("p_id", "sl")
        .agg(topk10(col("cos_r"), col("c_id")).as("tk"))
        .select(col("p_id"), col("sl"),
          when(size(col("tk.cs")) >= 10,
            element_at(col("tk.cs"), size(col("tk.cs"))))
            .otherwise(-2.0).as("lb"))
        .groupBy("p_id")
        .agg(map_from_entries(collect_list(struct(col("sl"), col("lb"))))
          .as("lbm"))
      val upper = (headDot + col("ptn") * col("tn")) / (col("pn") * col("cn"))
      pairs.join(broadcast(lbMap), "p_id")
        .select(col("p_id"),
          filter(typedlit(ScreenSweep),
            sl => upper >= element_at(col("lbm"), sl) - 1e-6).as("sets"),
          cosR.as("cos_r"), col("c_id"))
        .filter(size(col("sets")) > 0)
        .select(col("p_id"), explode(col("sets")).as("setting"),
          col("cos_r"), col("c_id"))
        .groupBy("p_id", "setting")
        .agg(topk10(col("cos_r"), col("c_id")).as("tk"), count(lit(1)).as("cnt"))
        .withColumn("sets", array(col("setting")))
    }

    familyCurve("ivf", IvfSweep, ivfPerBucket)
      .unionByName(familyCurve("lsh", LshSweep, lshPerBucket))
      .unionByName(familyCurve("screen", ScreenSweep, scrPerBucket))
      .orderBy("family", "setting")
  }

  /** The per-setting reference formulation of [[annCalibration]] — one
    * full candidate join + two aggregations per swept setting. Kept (and
    * NOT declared) solely as the equality oracle for the single-pass
    * rewrite: AnnCalibrationSpec asserts row-for-row equality between the
    * two on the shipped fixture.
    */
  private[graft] def annCalibrationReference(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val exactRows = cosineTopKFrom(emb).select("p_id", "c_id")
      .as[(Long, Long)].collect()
    val exactLit = exactRows.toSeq.toDF("p_id", "c_id")
    val nExact   = math.max(exactRows.length.toLong, 1L)
    val nVec     = emb.count()
    val nProbes  = exactRows.map(_._1).distinct.length.toLong
    val denom    = math.max(nProbes * (nVec - 1), 1L)

    val cents   = kmeansCentroidsFrom(emb)
    val indexed = ivfAssign(emb, cents)

    def curve(family: String, setting: Int, scored: DataFrame): DataFrame = {
      val nCand = scored.agg(count(lit(1)).as("n_cand"))
      val nHit = rankTopK(scored).select("p_id", "c_id")
        .join(broadcast(exactLit), Seq("p_id", "c_id"))
        .agg(count(lit(1)).as("n_hit"))
      nCand.crossJoin(broadcast(nHit))
        .select(lit(family).as("family"), lit(setting).as("setting"),
          col("n_cand"),
          expr(s"n_cand * 1000000 div $denom").as("cand_frac_micro"),
          expr(s"n_hit * 1000000 div $nExact").as("recall10_micro"))
    }

    val curves =
      IvfSweep.map(p => curve("ivf", p, ivfScored(indexed, cents, p))) ++
      LshSweep.map(p =>
        curve("lsh", p, lshScoredFrom(emb, NumTables, NumPlanes, p))) ++
      ScreenSweep.map(sl => curve("screen", sl, prunedSurvivorsFrom(emb, sl)))
    curves.reduce(_.unionByName(_)).orderBy("family", "setting")
  }

  // ---- incremental IVF maintenance -----------------------------------
  //
  // The operational gap between "train once" and a living 100 TB index:
  // ingest keeps arriving after the quantizer is trained. Appending is a
  // NARROW assignment map over broadcast-literal centroids — no retrain,
  // no touch of already-indexed rows, no shuffle — so it is cheap at any
  // batch size; what degrades over time is how well the frozen centroids
  // fit the grown corpus. ivfHealth quantifies that drift (staleness =
  // relative quantization-quality drop vs the trained baseline; imbalance
  // = hottest cell vs the ideal share) and needsRebalance trips the rare,
  // explicit retrain (kmeansCentroidsFrom on the grown corpus) instead of
  // paying it per batch. QueriesSpec gates the consequence: on a 2×-grown
  // clustered corpus the appended index's recall stays within a stated
  // margin of a full retrain.

  /** Drift past which the frozen quantizer should be retrained. */
  final val StalenessThreshold = 0.05
  /** Hottest-cell share (× the ideal `n/k`) past which cells should split. */
  final val ImbalanceThreshold = 4.0

  /** Index a (vec_id, embedding) frame under EXISTING centroids: one
    * narrow map, the append path needs nothing else.
    */
  private[graft] def ivfAssign(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      cellOf(col("embedding"), cents).as("cell"))

  /** Append new vectors to an existing index without retraining. */
  private[graft] def ivfAppend(indexed: DataFrame, newEmb: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    indexed.unionByName(ivfAssign(newEmb, cents))

  /** Retire vectors from a persisted index — works on BOTH layouts, the
    * IVF (vec_id, embedding, cell) frame and the IVFADC (vec_id, nrm,
    * codes, cell) frame: a keyed anti-join on vec_id, NO re-quantization.
    * The Dedup.retireFrom no-re-hash argument on the vector plane: a
    * surviving row's cell and codes are per-row functions of (vector,
    * frozen quantizers) alone — independent of which other rows exist —
    * so retire ≡ rebuild-under-frozen-quantizers EXACTLY (QueriesSpec
    * row equality, not just recall parity) and serving output over the
    * survivors is unchanged. One narrow anti-join against the
    * tombstone set; embeddings are never re-read.
    */
  private[graft] def retireVecs(index: DataFrame,
      tombstones: DataFrame): DataFrame =
    index.join(tombstones.select("vec_id"), Seq("vec_id"), "left_anti")

  /** The hottest cell id (max member count; ties → lowest id) — the
    * split target when [[IvfHealth]] flags imbalance. One bounded
    * O(cells)-row aggregate over the index.
    */
  private[graft] def hottestCell(indexed: DataFrame): Int = {
    val top = indexed.groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).limit(1).collect()
    require(top.nonEmpty,
      "hottestCell: empty index — no cells exist, nothing to split")
    top(0).getInt(0)
  }

  /** Two child centroids for a cell split: the [[kmeansCentroidsFrom]]
    * machinery restricted to the hot cell's members — distributed narrow
    * scans over 2×Dim broadcast literals, never a member collect. Returns
    * fewer than two children when the cell's training sample is
    * degenerate (< 2 sampled vectors) — the caller then skips the split.
    */
  private def splitChildren(members: DataFrame): Array[Array[Double]] = {
    val sampled = members.filter(col("vec_id") % TrainSampleMod === 0)
    if (sampled.limit(2).count() < 2) Array.empty
    else kmeansCentroidsFrom(members, 2, IvfIters)
  }

  /** The child-assignment column for a split: each member picks the
    * nearer of the TWO children only — child A keeps the split cell's
    * id, child B takes the next free id (`cents.length`) — so a split
    * can never leak a row into any other cell.
    */
  private def childCell(kids: Array[Array[Double]], cell: Int,
      newId: Int): Column = {
    val s = centScores(col("embedding"), kids)
    when(element_at(s, 1) >= element_at(s, 2), lit(cell))
      .otherwise(lit(newId)).cast("int")
  }

  /** SPLIT one cell of a persisted IVF index — the cheap response when
    * [[ivfHealth]] flags IMBALANCE (a hot cell) rather than staleness,
    * instead of the global retrain: a local 2-means over the hot cell's
    * members places two children, the hot cell's rows re-assign between
    * those two children ONLY, and every other row passes through an
    * un-recomputed filter — so routing for untouched cells is unchanged
    * BY CONSTRUCTION (QueriesSpec gates row equality, and post-split
    * recall within 0.1 of a full retrain), and the split costs
    * Θ(|hot cell|) where a retrain re-reads the corpus (ScaleProbe
    * measures the gap). Serving continues on the returned (index,
    * centroids): [[probeCells]] sizes itself off the array, so probes
    * simply see one more candidate cell. Degenerate cells (< 2 sampled
    * members, or all members identical → one empty child) return
    * unchanged/harmless results; ties go to child A.
    */
  private[graft] def ivfSplit(indexed: DataFrame,
      cents: Array[Array[Double]],
      cell: Int): (DataFrame, Array[Array[Double]]) = {
    val members = indexed.filter(col("cell") === cell)
    val kids = splitChildren(members.select("vec_id", "embedding"))
    if (kids.length < 2) (indexed, cents)
    else {
      val reassigned = members.select(col("vec_id"), col("embedding"),
        childCell(kids, cell, cents.length).as("cell"))
      (indexed.filter(col("cell") =!= cell).unionByName(reassigned),
        cents.updated(cell, kids(0)) :+ kids(1))
    }
  }

  /** The IVFADC face of [[ivfSplit]]: the composite index stores codes,
    * not vectors, so the hot cell's rows join back to the embeddings
    * (ONE keyed join, hot-cell-sized — never a corpus re-read) for the
    * child assignment; norms and PQ codes are per-row functions of
    * (vector, frozen codebooks) alone and carry over untouched — the
    * retireVecs no-re-encode argument on the split plane.
    */
  private[graft] def ivfPqSplit(index: DataFrame, emb: DataFrame,
      cents: Array[Array[Double]],
      cell: Int): (DataFrame, Array[Array[Double]]) = {
    val hot = index.filter(col("cell") === cell)
    val members = emb.join(hot.select("vec_id"), Seq("vec_id"))
    // coverage guard: an indexed vec_id missing from `emb` would silently
    // vanish from the returned index (the inner join drops it) — a split
    // must never shrink the index, so fail loud on a coverage gap instead.
    // Both counts are hot-cell-sized (bounded, same order as the 2-means
    // the split runs anyway).
    val (nHot, nMembers) = (hot.count(), members.count())
    require(nMembers == nHot,
      s"ivfPqSplit: embeddings cover only $nMembers of $nHot rows in cell " +
        s"$cell — refusing a split that would drop indexed vectors")
    val kids = splitChildren(members)
    if (kids.length < 2) (index, cents)
    else {
      val newCell = members.select(col("vec_id"),
        childCell(kids, cell, cents.length).as("cell"))
      val rehomed = hot.drop("cell").join(newCell, Seq("vec_id"))
        .select(index.columns.map(col).toIndexedSeq: _*)
      (index.filter(col("cell") =!= cell).unionByName(rehomed),
        cents.updated(cell, kids(0)) :+ kids(1))
    }
  }

  /** Mean best-centroid cosine — the quantization quality of a corpus
    * under the given centroids (1.0 = every vector sits on a centroid
    * direction). One narrow aggregation; O(1) result rows.
    */
  private[graft] def quantScore(emb: DataFrame,
      cents: Array[Array[Double]]): Double = {
    val r = withNorm(emb).select(avg(
      array_max(centScores(col("embedding"), cents)) / col("nrm")).as("q"))
      .head
    require(!r.isNullAt(0),
      "quantScore: empty corpus — no quantization fit to measure")
    r.getDouble(0)
  }

  final case class IvfHealth(staleness: Double, imbalance: Double) {
    def needsRebalance: Boolean =
      staleness > StalenessThreshold || imbalance > ImbalanceThreshold
  }

  /** Index health vs the quality measured at training time
    * (`trainedScore` = [[quantScore]] of the corpus the quantizer was
    * trained on). Two O(k)-result aggregations — the check is cheap enough
    * to run per append batch.
    */
  private[graft] def ivfHealth(indexed: DataFrame,
      cents: Array[Array[Double]], trainedScore: Double): IvfHealth = {
    // NaN/zero trainedScore would make staleness NaN, and a NaN compare
    // is silently false — needsRebalance would never fire. Fail loud.
    require(trainedScore > 0,
      s"ivfHealth: trainedScore must be a positive quantScore, got $trainedScore")
    val staleness = 1.0 - quantScore(indexed, cents) / trainedScore
    val counts = indexed.groupBy("cell").count().select("count")
      .collect().map(_.getLong(0))
    val ideal = counts.sum.toDouble / cents.length
    IvfHealth(staleness, if (ideal == 0) 0.0 else counts.max / ideal)
  }

  // ---- Product quantization (Jégou, Douze & Schmid, TPAMI 2011) --------

  /** PQ subspaces (codes per vector). */
  final val PqM = 8
  /** Codebook entries per subspace (a 5-bit code; byte-sized on disk). */
  final val PqKs = 32
  /** Lloyd rounds for the subspace codebooks (cheap: sample-sized). */
  final val PqIters = 4
  /** ADC shortlist reranked with exact cosine. */
  final val PqShortlist = 128

  /** Bounded training sample for the PQ codebooks (vectors collected). */
  final val PqTrainCap = 4096

  /** Per-subspace codebooks: Lloyd over a BOUNDED sample, driver-side.
    *
    * ONE Spark job — the first [[PqTrainCap]] of the [[TrainSampleMod]]
    * sample (deterministic take-ordered, ~2 MB at cap) — then every
    * subspace's [[PqIters]] Lloyd rounds run at driver memory speed.
    * A [[PqKs]]-entry codebook needs ~100 samples per centroid, not a
    * corpus fraction; bounded-sample codebook training is the published PQ
    * practice (Jégou, Douze & Schmid, TPAMI 2011 §V train on a learning
    * subset). Two rejected shapes, both measured at sf0.1: per-subspace
    * distributed Lloyd (kmeansCentroidsFrom × PqM) paid PqM×(1+iters)=40
    * sequential driver-synchronous jobs — 13.8 s of q_pq_topk's 15.1 s,
    * all fixed job-launch cost; fusing all subspaces into one aggregation
    * per round still paid (1+iters) jobs with fresh codegen per round
    * (~3 s). The sample the rounds iterate is bounded, so distributing
    * those rounds bought nothing at any scale.
    *
    * Same math as the distributed form: argmax-cosine assignment (ties →
    * lowest cell), mean update, emptied cell keeps its centroid; seeds are
    * the first [[PqKs]] sample vectors, as before.
    */
  private[graft] def pqCodebooks(emb: DataFrame): Array[Array[Array[Double]]] = {
    val sub = Dim / PqM
    val train = emb.filter(col("vec_id") % TrainSampleMod === 0)
      .orderBy("vec_id").limit(PqTrainCap)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(train.nonEmpty, "PQ quantizer needs at least one training vector")
    Array.tabulate(PqM) { m =>
      val pts = train.map(_.slice(m * sub, m * sub + sub))
      var cents = pts.take(PqKs).map(_.clone())
      val kEff = cents.length
      for (_ <- 0 until PqIters) {
        val sums = Array.fill(kEff, sub)(0.0)
        val counts = Array.fill(kEff)(0L)
        val nrms = cents.map { c =>
          val n = math.sqrt(c.map(x => x * x).sum); if (n == 0) 1.0 else n
        }
        pts.foreach { p =>
          var best = 0
          var bestS = Double.NegativeInfinity
          var j = 0
          while (j < kEff) {
            val c = cents(j)
            var d = 0.0
            var i = 0
            while (i < sub) { d += p(i) * c(i); i += 1 }
            val s = d / nrms(j)
            if (s > bestS) { bestS = s; best = j }
            j += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(kEff)(j =>
          if (counts(j) == 0) cents(j)
          else Array.tabulate(sub)(i => sums(j)(i) / counts(j)))
      }
      cents
    }
  }

  /** Compressed index: per vector its PqM 4-bit codes (cosine-nearest
    * codebook entry per subspace — the engine's metric is cosine
    * throughout, so quantization is by subvector direction) plus one float
    * norm. ~12 bytes a vector against 256 raw: the memory-bandwidth
    * reduction that makes a flat 100 TB ADC scan feasible — the scan
    * streams codes, never the embeddings.
    */
  /** The per-vector PQ code array as ONE Column over `embedding` —
    * shared by the flat index ([[pqEncode]]) and the IVFPQ composite
    * index ([[ivfPqIndex]]).
    */
  private def pqCodesCol(cbs: Array[Array[Array[Double]]]): Column = {
    val sub = Dim / PqM
    val kEff = cbs(0).length
    // one 3-d codebook literal + nested transform lambdas, NOT PqM × kEff
    // unrolled per-centroid columns: the unrolled form put 256 dot_ff
    // expressions (each with its own inline array literal) in the plan,
    // and codegen/compile of that tree — not the 2000-row data — was the
    // cost (measured ~3 s of the query)
    val cbLit = typedlit(cbs.map(_.map(_.map(_.toFloat).toSeq).toSeq).toSeq)
    val nrmLit = typedlit(cbs.map(_.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); if (n == 0) 1.0 else n
    }.toSeq).toSeq)
    transform(sequence(lit(0), lit(PqM - 1)), m => {
      val v = slice(col("embedding"), m * sub + 1, lit(sub))
      val scores = transform(sequence(lit(0), lit(kEff - 1)), j =>
        dot_ff(v, element_at(element_at(cbLit, m + 1), j + 1))
          / element_at(element_at(nrmLit, m + 1), j + 1))
      (array_position(scores, array_max(scores)) - 1).cast("int")
    })
  }

  private[graft] def pqEncode(emb: DataFrame,
      cbs: Array[Array[Array[Double]]]): DataFrame =
    withNorm(emb).select(col("vec_id"), col("nrm"), pqCodesCol(cbs).as("codes"))

  /** PQ-ADC ANN top-k: approximate cosine from codes alone
    * (Σ_m dot(probe_m, codebook_m[code_m]) / (|p|·|c|) — the asymmetric
    * distance computation: the probe stays full-precision, candidates are
    * their codes), per-probe [[PqShortlist]] via the partial top-k
    * Aggregator, then an exact rerank of the shortlist only (ids join back
    * to the stored vectors). Like the other ANN paths the scored pairs
    * never shuffle; unlike them the candidate SCAN reads ~12 bytes per
    * vector instead of 256.
    */
  def pqTopK(s: SparkSession, dir: String): DataFrame =
    pqTopKFrom(Tables.embeddings(s, dir))

  /** ADC approximate cosine of a coded candidate against a full-precision
    * probe — the asymmetric distance computation over ("pv", "pn",
    * "codes") columns: codebooks enter the plan as literals; element_at
    * picks the centroid of each candidate's code, dot_ff scores it
    * against the probe's subvector. The candidate's cosine denominator
    * uses the RECONSTRUCTED norm sqrt(Σ_m |c_m|²) (a second literal
    * lookup table), so approx = cos(probe, reconstruction) — codes alone
    * rank the scan with no per-candidate float beyond what the index
    * stores. Shared by the flat PQ scan and the IVFPQ composite.
    */
  private def adcApprox(cbs: Array[Array[Array[Double]]]): Column = {
    val sub = Dim / PqM
    val numer = (0 until PqM).map { m =>
      val cbLit = typedlit(cbs(m).map(_.map(_.toFloat).toSeq).toSeq)
      dot_ff(slice(col("pv"), m * sub + 1, sub),
        element_at(cbLit, element_at(col("codes"), m + 1) + 1))
    }.reduce(_ + _)
    val rnormSq = (0 until PqM).map { m =>
      val sqLit = typedlit(cbs(m).map(c => c.map(x => x * x).sum).toSeq)
      element_at(sqLit, element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    numer / (col("pn") * sqrt(rnormSq))
  }

  /** [[pqTopK]] over an explicit (vec_id, embedding) frame. */
  private[graft] def pqTopKFrom(emb: DataFrame): DataFrame = {
    val cbs = pqCodebooks(emb)
    val codes = pqEncode(emb, cbs)
    val e = withNorm(emb)
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
        col("nrm").as("pn"))
    val shortAgg = udaf(new graft.functions.TopKAgg(PqShortlist))
    val shortlist = codes.join(broadcast(probes), col("p_id") =!= col("vec_id"))
      .select(col("p_id"), adcApprox(cbs).as("a"), col("vec_id").as("c_id"))
      .groupBy("p_id").agg(shortAgg(col("a"), col("c_id")).as("tk"))
      .select(col("p_id"), explode(col("tk.ids")).as("c_id"))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"))
    rankTopK(shortlist.join(cands, "c_id").join(broadcast(probes), "p_id")
      .select(col("p_id"),
        round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
          .as("cos_r"),
        col("c_id")))
  }

  // ---- IVFPQ: coarse quantizer + in-cell ADC scan (FAISS IVFPQ shape) --

  /** IVFPQ shortlist — half the flat-PQ one: the coarse quantizer has
    * already concentrated the scan on the probe's nearest cells, so the
    * rerank needs less headroom.
    */
  final val IvfPqShortlist = 64

  /** The composite index a real deployment stores: one row per vector
    * with its IVF cell, PQ codes and norm — ONE pass over the corpus
    * (assignment and encoding are both narrow maps over literal model
    * state).
    */
  private[graft] def ivfPqIndex(emb: DataFrame, cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]]): DataFrame =
    withNorm(emb).select(col("vec_id"), col("nrm"),
      pqCodesCol(cbs).as("codes"),
      cellOf(col("embedding"), cents).as("cell"))

  /** IVFPQ ANN top-k (Jégou, Douze & Schmid, TPAMI 2011 §V's IVFADC):
    * the IVF coarse quantizer routes each probe to its [[IvfProbes]]
    * nearest cells, the PQ ADC scan scores ONLY those cells' codes, and
    * an exact rerank recovers true cosines for the [[IvfPqShortlist]]
    * survivors. The composition scans BOTH axes down: candidate ROWS
    * drop to the probed-cell fraction (vs flat PQ's full scan) and bytes
    * per row drop to the ~12-byte codes (vs IVF's full vectors); the
    * exact stage touches ≤ probes × shortlist vectors (vs IVF exact-
    * scoring every probed row). QueriesSpec gates recall@10 ≥ 0.7 on the
    * clustered fixture AND that both candidate counts sit below their
    * single-index parents.
    */
  def ivfPqTopK(s: SparkSession, dir: String): DataFrame =
    ivfPqTopKFrom(Tables.embeddings(s, dir))

  /** [[ivfPqTopK]] over an explicit (vec_id, embedding) frame. */
  private[graft] def ivfPqTopKFrom(emb: DataFrame): DataFrame =
    rankTopK(ivfPqExactScored(emb))

  /** The shortlist-then-exact-rerank stage, exposed so the QueriesSpec
    * gate can count candidates at each phase.
    */
  private[graft] def ivfPqExactScored(emb: DataFrame): DataFrame = {
    val cents = kmeansCentroidsFrom(emb)
    val cbs   = pqCodebooks(emb)
    ivfPqExactScoredIndexed(ivfPqIndex(emb, cents, cbs), emb, cents, cbs)
  }

  /** Append a new-vector batch into an EXISTING IVFADC index without
    * retraining either quantizer: each new vector gets its nearest
    * existing coarse cell and its PQ codes against the frozen codebooks —
    * one narrow map over the batch (both quantizers enter the plan as
    * literals), no shuffle, already-indexed rows untouched. The cost
    * asymmetry vs [[ivfPqIndex]] on the grown corpus is that a retrain
    * re-reads and re-encodes EVERY vector after re-running Lloyd for both
    * quantizers; what degrades under append-only growth is quantizer fit,
    * which [[ivfPqHealth]] watches (IVF staleness/imbalance + codebook
    * reconstruction drift) so the rare retrain is explicit, not per batch.
    * QueriesSpec gates the consequence: on a 2×-grown clustered corpus the
    * appended index's recall@10 stays within 0.1 of a full retrain.
    */
  private[graft] def ivfPqAppend(index: DataFrame, newEmb: DataFrame,
      cents: Array[Array[Double]], cbs: Array[Array[Array[Double]]]): DataFrame =
    index.unionByName(ivfPqIndex(newEmb, cents, cbs))

  /** Mean reconstruction cosine of a corpus under frozen PQ codebooks —
    * each vector's [[adcApprox]] against its OWN codes, i.e.
    * cos(v, reconstruction(v)); 1.0 = lossless. The PQ analog of the IVF
    * [[quantScore]]: one narrow O(1)-result aggregation, cheap enough to
    * run per append batch.
    */
  private[graft] def pqQuantScore(emb: DataFrame,
      cbs: Array[Array[Array[Double]]]): Double = {
    val r = withNorm(emb).select(col("embedding").as("pv"), col("nrm").as("pn"),
      pqCodesCol(cbs).as("codes"))
      .select(avg(adcApprox(cbs)).as("q")).head
    require(!r.isNullAt(0),
      "pqQuantScore: empty corpus — no reconstruction fit to measure")
    r.getDouble(0)
  }

  final case class IvfPqHealth(ivf: IvfHealth, codebookDrift: Double) {
    /** Retrain when EITHER quantizer no longer fits: the coarse cells
      * (staleness/imbalance — the [[IvfHealth]] rule) or the codebooks
      * (relative reconstruction-quality drop past [[StalenessThreshold]]).
      */
    def needsRebuild: Boolean =
      ivf.needsRebalance || codebookDrift > StalenessThreshold
  }

  /** IVFADC index health vs the quality measured at training time.
    * `emb` is the grown corpus (the quality metrics need raw vectors);
    * `index` supplies the per-cell occupancy for the imbalance axis.
    * Three bounded-result aggregations.
    */
  private[graft] def ivfPqHealth(emb: DataFrame, index: DataFrame,
      cents: Array[Array[Double]], cbs: Array[Array[Array[Double]]],
      trainedIvfScore: Double, trainedPqScore: Double): IvfPqHealth = {
    // same guard as ivfHealth: a zero/NaN trained score makes
    // staleness/drift NaN, and NaN compares silently un-trip needsRebuild
    require(trainedIvfScore > 0 && trainedPqScore > 0,
      s"ivfPqHealth: trained scores must be positive quantScores, got " +
        s"ivf=$trainedIvfScore pq=$trainedPqScore")
    val staleness = 1.0 - quantScore(emb, cents) / trainedIvfScore
    val counts = index.groupBy("cell").count().select("count")
      .collect().map(_.getLong(0))
    val ideal = counts.sum.toDouble / cents.length
    val imbalance = if (ideal == 0) 0.0 else counts.max / ideal
    val drift = 1.0 - pqQuantScore(emb, cbs) / trainedPqScore
    IvfPqHealth(IvfHealth(staleness, imbalance), drift)
  }

  /** The IVFPQ query over an ALREADY-BUILT index — the serving path once
    * the (vec_id, nrm, codes, cell) frame persists, shared by the
    * train-once query and the incrementally-appended index. `emb` supplies
    * probe vectors and the exact-rerank candidates (the index stores codes
    * only — by design it never carries the embeddings).
    */
  private[graft] def ivfPqTopKIndexed(index: DataFrame, emb: DataFrame,
      cents: Array[Array[Double]], cbs: Array[Array[Array[Double]]]): DataFrame =
    rankTopK(ivfPqExactScoredIndexed(index, emb, cents, cbs))

  private[graft] def ivfPqExactScoredIndexed(index: DataFrame, emb: DataFrame,
      cents: Array[Array[Double]], cbs: Array[Array[Array[Double]]]): DataFrame = {
    val e = withNorm(emb)
    val probes = probeBatch(e)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
        col("nrm").as("pn"),
        explode(probeCells(col("embedding"), cents, IvfProbes)).as("cell"))
    val shortAgg = udaf(new graft.functions.TopKAgg(IvfPqShortlist))
    val shortlist = index.join(broadcast(probes), Seq("cell"))
      .filter(col("p_id") =!= col("vec_id"))
      .select(col("p_id"), adcApprox(cbs).as("a"), col("vec_id").as("c_id"))
      .groupBy("p_id").agg(shortAgg(col("a"), col("c_id")).as("tk"))
      .select(col("p_id"), explode(col("tk.ids")).as("c_id"))
    val pv = probeBatch(e).select(col("vec_id").as("p_id"),
      col("embedding").as("pv"), col("nrm").as("pn"))
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      col("nrm").as("cn"))
    shortlist.join(cands, "c_id").join(broadcast(pv), "p_id")
      .select(col("p_id"),
        round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
          .as("cos_r"),
        col("c_id"))
  }

  // ---- SemDeDup: semantic dedup in embedding space ----------------------
  //
  // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): exact all-pairs cosine
  // over a web-scale corpus is Θ(N²); the tractable shape is CLUSTER FIRST,
  // then compare pairs only WITHIN a cluster — Θ(Σ|cell|²), bounded by the
  // max cell size and embarrassingly parallel across cells. Semantic
  // near-duplicates have near-1 cosine, so they share a cell with high
  // probability and the within-cell pass catches them (pair recall gated
  // on the clustered fixture in QueriesSpec).
  //
  // Two cluster sources drive the SAME kernel:
  //  - q_semdedup: the cluster key is a GIVEN assignment column (the
  //    fixture's `label`; in production the output of any upstream
  //    clustering or sharding) → closed-form, ORACLE-CHECKED end to end.
  //  - q_semdedup_cells ([[semDedupCells]]): clusters are LEARNED by the
  //    integer-micro Lloyd trajectory ([[Clustering]]) — the paper's
  //    actual shape, and since that trajectory has an unrolled temp-table
  //    oracle, the composed query is ALSO oracle-checked end to end.
  //
  // Scale shape: ONE equi-join keyed on the cluster id (no cartesian, no
  // global window), and scored pairs reduce immediately into a per-vector
  // aggregate (max cosine / dup count / keep flag) — pairs never survive
  // past the exchange that built them. The keep policy is deterministic:
  // a vector drops iff some same-cluster LOWER-id vector sits within
  // cosine ≥ τ (one representative per ε-neighborhood; lowest id is the
  // reproducible choice, and a production corpus can pre-sort ids by
  // quality so "lowest" = "best"). Hot cells are ordinary AQE skew-join
  // territory — same posture as the spatial grid join.

  /** Within-cluster dup threshold: ~p99 of within-label cosine on the
    * near-isotropic fixture corpus (measured: p99 ≈ 0.284, max ≈ 0.45),
    * so decisions are nontrivial but deterministic. Real embedding
    * corpora run τ ≈ 0.95+; the kernel is τ-agnostic.
    */
  final val SemDedupTau = 0.25

  /** Per-vector semantic-dedup decisions with `clusterCol` as the cluster
    * key: (vec_id, cluster, max_cos, n_dups, kept). `max_cos` is the
    * vector's best same-cluster cosine (NULL for singleton clusters),
    * `n_dups` its ≥ τ neighbor count, `kept` the survival flag.
    */
  private[graft] def semDedup(emb: DataFrame, clusterCol: String,
      tau: Double = SemDedupTau): DataFrame = {
    val e = withNorm(emb).withColumn("cluster", col(clusterCol))
    val a = e.select(col("cluster"), col("vec_id"),
      col("embedding").as("av"), col("nrm").as("an"))
    val b = e.select(col("cluster"), col("vec_id").as("v2"),
      col("embedding").as("bv"), col("nrm").as("bn"))
    val cos = dot_ff(col("av"), col("bv")) / (col("an") * col("bn"))
    val agg = a.join(b, Seq("cluster"))
      .filter(col("vec_id") =!= col("v2"))
      .select(col("vec_id"), cos.as("cos"), col("v2"))
      .groupBy("vec_id")
      .agg(max("cos").as("mc"),
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("nd"),
        max(when(col("cos") >= tau && col("v2") < col("vec_id"), true)
          .otherwise(false)).as("dropped"))
    e.select("vec_id", "cluster").join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        round(col("mc"), 6).as("max_cos"),
        coalesce(col("nd"), lit(0L)).as("n_dups"),
        (!coalesce(col("dropped"), lit(false))).as("kept"))
  }

  /** [[semDedup]] with LEARNED clusters: every vector assigned by the
    * integer-micro Lloyd trajectory q_kmeans_assign already oracle-checks
    * ([[Clustering.cellAssignments]]). Swapping the float Lloyd-lite
    * quantizer for the deterministic one makes the WHOLE learned-cell
    * SemDeDup cell-exact across engines — the assignment joins in on
    * vec_id and the within-cell kernel is the proven [[semDedup]].
    */
  private[graft] def semDedupCells(emb: DataFrame,
      tau: Double = SemDedupTau): DataFrame =
    semDedup(emb.join(Clustering.cellAssignments(emb), Seq("vec_id")),
      "cell", tau).withColumnRenamed("cluster", "cell")

  /** The frozen cell index for [[semDedupIngestFilter]]: corpus vectors
    * stamped with their nearest-centroid cell (persist this once; the
    * ingest path only ever reads it).
    */
  private[graft] def cellIndexOf(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    emb.withColumn("cell", cellOf(col("embedding"), cents))

  /** Ingest-time SemDeDup against a FROZEN cell index — the semantic twin
    * of Dedup.dropNearDups: `index` is a persisted (vec_id, embedding,
    * cell) frame from [[cellIndexOf]], and each incoming vector is
    * assigned to its nearest frozen cell (cosine-argmax over the same
    * centroids — scale-invariant, so a re-upload lands in its original's
    * cell) and dropped iff some PERSISTED member of that cell sits within
    * cosine ≥ τ. Decisions depend on (vector, frozen index) alone — never
    * on batch peers or arrival order — which is what makes the streaming
    * wiring (Streams.semDedupIngest) batch ≡ stream by construction.
    * Per batch: one narrow assignment map (centroids ride as literals) +
    * one cell-keyed equi-join against the index — the incremental analog
    * of the batch kernel's Θ(Σ|cell|²) posture, restricted to
    * (new × indexed); batch² and index² pairs are never formed.
    */
  private[graft] def semDedupIngestFilter(index: DataFrame,
      cents: Array[Array[Double]], batch: DataFrame,
      tau: Double = SemDedupTau): DataFrame = {
    val b = withNorm(batch).withColumn("cell", cellOf(col("embedding"), cents))
    val m = withNorm(index).select(col("cell"),
      col("embedding").as("mv"), col("nrm").as("mn"))
    val cos = dot_ff(col("embedding"), col("mv")) / (col("nrm") * col("mn"))
    val dupIds = b.join(m, Seq("cell"))
      .filter(cos >= tau)
      .select("vec_id").distinct()
    batch.join(dupIds, Seq("vec_id"), "left_anti")
  }

  val queries: Seq[Q] = Seq(

    // Per-label embedding centroids — the distributed tensor-mean shape
    // (label profiling, per-class centroids for classification or IVF
    // seeding): explode to (label, pos, x), aggregate with map-side
    // partials keyed by (label, pos) — vectors never shuffle, only
    // labels×dim partial rows. Components are snapped to integer
    // micro-units BEFORE summing (the integer-cents rule), so sums are
    // exact in any partition/merge order and the mean is an exact-integer
    // division — cross-engine deterministic with no FP-order drift.
    Q("q_label_centroids",
      s"""SELECT label, CAST(i AS INTEGER) AS pos,
         |       count(*) AS n,
         |       CAST(sum(CAST(round(embedding[i + 1]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
         |       (CAST(sum(CAST(round(embedding[i + 1]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) / count(*)) AS avg_micro
         |FROM embeddings, range(0, $Dim) t(i)
         |GROUP BY label, i ORDER BY label, pos""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          sum(round(col("x").cast("double") * 1000000).cast("long")).as("sum_micro"))
        .select(col("label"), col("pos").cast("int").as("pos"), col("n"),
          col("sum_micro"), (col("sum_micro") / col("n")).as("avg_micro"))
        .orderBy("label", "pos")
    },
    Q("q_cosine_topk",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT * FROM n WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024
        |), d AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS c_id,
        |         round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) AS cos_r
        |  FROM p, n c
        |  WHERE c.vec_id <> p.vec_id
        |)
        |SELECT p_id, rank, c_id, cos_r FROM (
        |  SELECT p_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY p_id
        |           ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM d)
        |WHERE rank <= 10 ORDER BY p_id, rank""".stripMargin)(cosineTopK),

    // The SAME exact contract served through bound-pruning (identical
    // oracle SQL — DuckDB hash-equality at three scale factors IS the
    // exactness proof; see cosineTopKPruned).
    Q("q_cosine_topk_ann",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT * FROM n WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024
        |), d AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS c_id,
        |         round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) AS cos_r
        |  FROM p, n c
        |  WHERE c.vec_id <> p.vec_id
        |)
        |SELECT p_id, rank, c_id, cos_r FROM (
        |  SELECT p_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY p_id
        |           ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM d)
        |WHERE rank <= 10 ORDER BY p_id, rank""".stripMargin)(cosineTopKPruned),

    // Int8 scalar-quantized MIPS — the quantized retrieval plane is
    // integer-exact, so THIS ann-family member is fully oracle-checked
    // (hash-match is the proof the int8 scoring contract is reproducible
    // engine-to-engine; the recall bridge to float cosine lives in
    // QueriesSpec).
    Q("q_sq_topk",
      """WITH q AS (
        |  SELECT vec_id,
        |         [greatest(-127, least(127, (CAST(round(embedding[i+1]::DOUBLE * 1000000) AS BIGINT) * 127) // 1000000)) for i in range(64)] AS qv
        |  FROM embeddings
        |), p AS (
        |  SELECT * FROM q WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024
        |), d AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS c_id,
        |         CAST(list_sum([p.qv[i+1] * c.qv[i+1] for i in range(64)]) AS BIGINT) AS dot_q
        |  FROM p, q c WHERE c.vec_id <> p.vec_id
        |)
        |SELECT p_id, rank, c_id, dot_q FROM (
        |  SELECT p_id, c_id, dot_q,
        |         CAST(row_number() OVER (PARTITION BY p_id
        |           ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank
        |  FROM d)
        |WHERE rank <= 10 ORDER BY p_id, rank""".stripMargin)(sqTopK),

    // kNN majority-vote classification over the exact cosine top-k — the
    // label-transfer / weak-supervision pattern (tag unlabeled documents
    // from their nearest labeled neighbors). Rides the proven
    // q_cosine_topk contract (same probe subset, same rounded-cosine
    // (cos_r DESC, c_id) ranking — hash-proven at 3 SFs), so the vote is
    // over an identical neighbor set in both engines; the argmax is a
    // total order (votes DESC, label ASC). Scale shape: the vote is a
    // (p_id, label) groupBy over probes×k rows and the argmax an
    // array_min over the per-probe vote structs — O(probes · k), nothing
    // corpus-sized after the top-k stage.
    Q("q_knn_classify",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT * FROM n WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024
        |), d AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS c_id,
        |         round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) AS cos_r
        |  FROM p, n c
        |  WHERE c.vec_id <> p.vec_id
        |), r AS (
        |  SELECT p_id, c_id FROM (
        |    SELECT p_id, c_id,
        |           row_number() OVER (PARTITION BY p_id
        |             ORDER BY cos_r DESC, c_id) AS rank
        |    FROM d)
        |  WHERE rank <= 10
        |), v AS (
        |  SELECT r.p_id, e.label, CAST(count(*) AS BIGINT) AS n_votes
        |  FROM r JOIN embeddings e ON e.vec_id = r.c_id
        |  GROUP BY r.p_id, e.label
        |), pr AS (
        |  SELECT p_id, label AS pred_label, n_votes FROM (
        |    SELECT p_id, label, n_votes,
        |           row_number() OVER (PARTITION BY p_id
        |             ORDER BY n_votes DESC, label) AS rn
        |    FROM v)
        |  WHERE rn = 1
        |)
        |SELECT pr.p_id, pr.pred_label, pr.n_votes,
        |       e.label AS true_label,
        |       (pr.pred_label = e.label) AS correct
        |FROM pr JOIN embeddings e ON e.vec_id = pr.p_id
        |ORDER BY p_id""".stripMargin) { (s, dir) =>
      val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
      val votes = cosineTopK(s, dir)
        .join(labels.withColumnRenamed("vec_id", "c_id"), "c_id")
        .groupBy("p_id", "label").agg(count(lit(1)).as("n_votes"))
      val pred = votes
        .groupBy("p_id")
        .agg(min(struct((-col("n_votes")).as("nv"), col("label").as("lab"))).as("m"))
        .select(col("p_id"), col("m.lab").as("pred_label"),
          (-col("m.nv")).as("n_votes"))
      pred.join(labels.withColumnRenamed("vec_id", "p_id"), "p_id")
        .select(col("p_id"), col("pred_label"), col("n_votes"),
          col("label").as("true_label"),
          (col("pred_label") === col("label")).as("correct"))
        .orderBy("p_id")
    },

    // HARD-NEGATIVE MINING — the contrastive-training data op (the
    // in-batch-negatives refinement every dense-retriever recipe uses,
    // e.g. DPR/Contriever): for each probe, the top-10 most-similar
    // vectors whose LABEL DIFFERS — maximally confusing non-matches. Rides
    // the proven exact-cosine contract (same probe batch, same rounded-
    // cosine (cos_r DESC, c_id) ranking) with the label-mismatch predicate
    // pushed BELOW the top-k aggregator, so the mined negatives are exact,
    // not a post-filter of an overall top-k (a negative can rank far past
    // the overall top-10). Same scale shape as q_cosine_topk: probes
    // broadcast, partial top-k per partition, shuffle O(partitions ×
    // probes × k).
    Q("q_hard_negatives",
      """WITH n AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT * FROM n WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024
        |), d AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS c_id, c.label AS neg_label,
        |         round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) AS cos_r
        |  FROM p, n c
        |  WHERE c.vec_id <> p.vec_id AND c.label <> p.label
        |)
        |SELECT p_id, rank, c_id, neg_label, cos_r FROM (
        |  SELECT p_id, c_id, neg_label, cos_r,
        |         CAST(row_number() OVER (PARTITION BY p_id
        |           ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM d)
        |WHERE rank <= 10 ORDER BY p_id, rank""".stripMargin) { (s, dir) =>
      val e = withNorm(Tables.embeddings(s, dir))
      val probes = probeBatch(e).select(col("vec_id").as("p_id"),
        col("embedding").as("pv"), col("nrm").as("pn"),
        col("label").as("p_label"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
        col("nrm").as("cn"), col("label").as("c_label"))
      val cosR = round(dot_ff(col("pv"), col("cv")) / (col("pn") * col("cn")), 6)
      rankTopK(cands.join(broadcast(probes),
          col("p_id") =!= col("c_id") && col("p_label") =!= col("c_label"))
          .select(col("p_id"), cosR.as("cos_r"), col("c_id")))
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("c_id"), col("label").as("neg_label")), "c_id")
        .select("p_id", "rank", "c_id", "neg_label", "cos_r")
        .orderBy("p_id", "rank")
    },

    // Embedding-cosine near-dup over consecutive-id pairs (exact slice).
    Q("q_embed_neardup",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_r
        |FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
        |ORDER BY v1""".stripMargin) { (s, dir) =>
      val e = withNorm(Tables.embeddings(s, dir))
      val a = e.select(col("vec_id").as("v1"), col("embedding").as("av"), col("nrm").as("an"))
      val b = e.select(col("vec_id").as("v2"), col("embedding").as("bv"), col("nrm").as("bn"))
      a.join(b, col("v2") === col("v1") + 1)
        .select(col("v1"), col("v2"),
          round(dot_ff(col("av"), col("bv")) / (col("an") * col("bn")), 6).as("cos_r"))
        .orderBy("v1")
    },

    // SemDeDup with a GIVEN cluster assignment (the label column): the
    // within-cluster pairwise kernel, per-vector aggregate, and the
    // lowest-id keep policy are all closed-form → fully oracle-checked.
    // Cosines are bit-identical across engines (float→double cast is
    // exact; both accumulate in double in index order), so round(6) and
    // the ≥ τ comparisons agree cell-for-cell.
    Q("q_semdedup",
      s"""WITH n AS (
         |  SELECT vec_id, label AS cluster, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id,
         |         max(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS mc,
         |         count(*) FILTER (WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |                                >= $SemDedupTau) AS nd,
         |         bool_or(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SemDedupTau
         |                 AND b.vec_id < a.vec_id) AS dropped
         |  FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
         |  GROUP BY a.vec_id)
         |SELECT n.vec_id, n.cluster, round(p.mc, 6) AS max_cos,
         |       coalesce(p.nd, 0) AS n_dups,
         |       NOT coalesce(p.dropped, FALSE) AS kept
         |FROM n LEFT JOIN p ON n.vec_id = p.vec_id
         |ORDER BY n.vec_id""".stripMargin) { (s, dir) =>
      semDedup(Tables.embeddings(s, dir), "label").orderBy("vec_id")
    },

    // SemDeDup with LEARNED clusters — the paper's actual shape. The
    // oracle composes the km_ trajectory script (every Lloyd round
    // materialized, the q_kmeans_assign mechanism) with the within-cell
    // kernel above, cluster = final assignment: training, assignment and
    // every keep decision are cell-exact across engines.
    Q("q_semdedup_cells",
      s"""${Clustering.cellsScriptSql}
         |WITH n AS (
         |  SELECT e.vec_id, k.cell, e.embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS nrm
         |  FROM embeddings e JOIN km_cells k ON k.vec_id = e.vec_id),
         |p AS (
         |  SELECT a.vec_id,
         |         max(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS mc,
         |         count(*) FILTER (WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |                                >= $SemDedupTau) AS nd,
         |         bool_or(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SemDedupTau
         |                 AND b.vec_id < a.vec_id) AS dropped
         |  FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id <> b.vec_id
         |  GROUP BY a.vec_id)
         |SELECT n.vec_id, n.cell, round(p.mc, 6) AS max_cos,
         |       coalesce(p.nd, 0) AS n_dups,
         |       NOT coalesce(p.dropped, FALSE) AS kept
         |FROM n LEFT JOIN p ON n.vec_id = p.vec_id
         |ORDER BY n.vec_id""".stripMargin) { (s, dir) =>
      semDedupCells(Tables.embeddings(s, dir)).orderBy("vec_id")
    },

    // Exact Hamming range search over SIGN-QUANTIZED embeddings via
    // Multi-Index Hashing (Norouzi, Punjani & Fleet 2012): every vector's
    // 64-bit sign code splits into [[MihChunks]] 16-bit substrings; a pair
    // within total distance [[MihTau]] must, by pigeonhole, agree within
    // floor(tau/chunks) = [[MihRadius]] on SOME substring, so enumerating
    // each substring's radius-3 neighborhood (697 masks — a model-state
    // literal) and equi-joining probed keys against indexed keys finds
    // every qualifying pair; an exact popcount check then removes the
    // false candidates. The ORACLE is the brute-force all-pairs scan —
    // output equality per round IS the proof that the index misses
    // nothing. Scale shape, stated honestly: probe work is
    // Θ(n·masks·chunks) (linear), but the CANDIDATE set has a background
    // floor of Θ(n²·p) where p = P(some chunk within radius) — at these
    // parameters (16-bit chunks, radius 3) p ≈ 4·1.06% for uncorrelated
    // codes, a 24× constant-factor cut vs brute force (measured: 83.7k
    // candidates vs 2.0M pairs at sf0.1), not asymptotic linearity.
    // True near-linearity needs the background collision rate driven
    // down by parameter choice — longer codes from more dims, more and
    // longer chunks (p halves per extra chunk bit) — which is exactly
    // how production MIH deployments (Norouzi et al. run 128-bit codes)
    // size the index; the operator exposes those as [[MihChunks]]/
    // [[MihTau]]. Codes are split lo/hi 32-bit halves so no value ever
    // sets bit 63 (DuckDB sums would promote to HUGEINT where Spark
    // wraps — the integer-magnitude rule).
    Q("q_hamming_mih",
      s"""WITH codes AS (
         |  SELECT vec_id,
         |         CAST(list_sum([CASE WHEN embedding[i+1] > 0
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS lo,
         |         CAST(list_sum([CASE WHEN embedding[i+33] > 0
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS hi
         |  FROM embeddings)
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         |       CAST(bit_count(xor(a.lo, b.lo))
         |            + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS ham
         |FROM codes a JOIN codes b ON a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
         |      <= $MihTau
         |ORDER BY v1, v2""".stripMargin) { (s, dir) =>
      hammingMih(Tables.embeddings(s, dir)).orderBy("v1", "v2")
    },

    // The PRODUCTION parameterization of the same index: 128-bit codes
    // (sign bits + Winner-Take-All rank bits, [[signCodes128]]) in 8
    // chunks at the same per-chunk radius 3 and matched relative
    // tolerance (31/128 ≈ 15/64) — the width Norouzi et al. evaluate
    // at. See [[Mih128Tau]] for what the doubled width buys (background
    // pairs in the OUTPUT drop four orders of magnitude; candidate work
    // stays Θ(n²·p)). The oracle stays the brute-force all-pairs scan,
    // so green re-proves index completeness at the wider width. On this
    // near-isotropic corpus 31/128 sits BELOW the closest-pair distance
    // at some scales (0–1 rows; min pair distance 27–33 across shipped
    // sfs) — precisely the clean sparse regime the wider fingerprint
    // exists for; the clustered-fixture spec drives the same index
    // through a dense in-range pair set (>100 pairs) plus the 7×4+3
    // pigeonhole worst case.
    Q("q_hamming_mih128",
      s"""WITH codes AS (
         |  SELECT vec_id,
         |         CAST(list_sum([CASE WHEN embedding[i+1] > 0
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS w0,
         |         CAST(list_sum([CASE WHEN embedding[i+33] > 0
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS w1,
         |         CAST(list_sum([CASE WHEN embedding[i+1] > embedding[i+2]
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS w2,
         |         CAST(list_sum([CASE WHEN embedding[i+33] > embedding[((i+33)%64)+1]
         |                        THEN (1::BIGINT << i) ELSE 0 END
         |                        for i in range(0, 32)]) AS BIGINT) AS w3
         |  FROM embeddings)
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         |       CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
         |            + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
         |            AS INTEGER) AS ham
         |FROM codes a JOIN codes b ON a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
         |      + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
         |      <= $Mih128Tau
         |ORDER BY v1, v2""".stripMargin) { (s, dir) =>
      hammingMih128(Tables.embeddings(s, dir)).orderBy("v1", "v2")
    },

    Q.noOracle("q_ann_lsh_topk")(annLshTopK),

    Q.noOracle("q_ann_screen_topk")(screenTopK),

    Q.noOracle("q_ann_ivf_topk")(annIvfTopK),

    Q.noOracle("q_pq_topk")(pqTopK),

    Q.noOracle("q_ivfpq_topk")(ivfPqTopK),

    Q.noOracle("q_ann_calibration")(annCalibration)
  )
}
