package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed Lloyd k-means over the embeddings table — the first
  * ORACLE-CHECKED clustering trajectory (the Lloyd-lite quantizers in
  * [[Similarity]] train on bounded samples and are recall-gated, not
  * cell-exact). The determinism mechanism is the PageRank one
  * ([[Graph]]): the whole trajectory lives in integer MICRO-units.
  *
  *  - vectors snap once: vm[i] = round(double(embedding[i]) · 10⁶) — a
  *    float widens to double exactly and one correctly-rounded IEEE
  *    multiply+round is identical in both engines;
  *  - distances are exact integer sums Σ(vm−cm)² (|coord| ≤ ~10⁶ →
  *    64·(2·10⁶)² < 2⁵³ ≪ 2⁶³, no overflow, order-free);
  *  - assignment is argmin(dist, cell) — total order, ties to the lowest
  *    cell id;
  *  - the centroid update truncate-divides integer sums (Spark `div` ≡
  *    DuckDB `//` on any sign), so the next round starts from identical
  *    integers. An emptied cell keeps its previous centroid.
  *
  * Scale shape: assignment is a NARROW map — the k×64 centroid matrix is
  * bounded model state (the accepted class: PQ codebooks, BPE vocab,
  * prefix-sum offsets) folded into codegen'd literals, so scoring never
  * shuffles the corpus. The update is ONE groupBy(cell) with map-side
  * partial aggregation of 64 sum columns — per round the wire carries
  * O(partitions · k · 64) partials, not O(N). The oracle is a
  * multi-statement DuckDB temp-table script (the Graph mechanism): each
  * round's assignment and update MATERIALIZE once, km_-prefixed.
  */
object Clustering {

  /** Cells, Lloyd rounds, vector width, micro scale. */
  final val KmK     = 8
  final val KmIters = 3
  final val Dim     = 64

  /** PCA power-iteration geometry: rounds, the normalized-vector scale
    * (iterates live in integer ten-thousandths of max-norm 1), and the
    * covariance down-scale that keeps every matvec term far from 2⁶³
    * (|Ĉ| ≤ Σd² ≈ N·4·10¹², so Ĉ/10⁶ · 10⁴ · 64 ≈ N·2.5·10¹² — safe to
    * N ~ 10⁶ vectors at micro snapping; rescale the snap beyond that).
    */
  final val PcIters  = 12
  final val PcVScale = 10000L
  final val PcCScale = 1000000L

  /** vec_id + micro-snapped integer vector. */
  private def vmFrame(s: SparkSession, dir: String): DataFrame =
    vmOf(Tables(s, dir, "embeddings"))

  /** Micro-snap an explicit (vec_id, embedding) frame. */
  private[graft] def vmOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS LONG))")
        .as("vm"))

  /** Final (vec_id, cell) assignment of the oracle-checked trajectory over
    * an explicit (vec_id, embedding) frame — the cluster source
    * [[Similarity.semDedupCells]] plugs into the within-cell kernel.
    */
  private[graft] def cellAssignments(emb: DataFrame): DataFrame =
    kmeansAssignFrom(vmOf(emb)).select("vec_id", "cell")

  /** Oracle-side twin of [[cellAssignments]]: the full km_ trajectory
    * script plus a km_cells(vec_id, cell) temp table holding the final
    * assignment, for composition into downstream oracle scripts.
    */
  private[graft] def cellsScriptSql: String =
    s"""$kmScriptPrefix
       |CREATE OR REPLACE TEMP TABLE km_cells AS
       |  SELECT vec_id, cell FROM ($kmFinalAssignSql) WHERE rn = 1;""".stripMargin

  /** The full trajectory over an explicit (vec_id, vm) frame: seed from
    * the k lowest ids, run `iters` Lloyd rounds, emit the final
    * assignment — the ScaleProbe entry point.
    */
  private[graft] def kmeansAssignFrom(vmIn: DataFrame,
      iters: Int = KmIters): DataFrame = {
    val vm = vmIn.localCheckpoint() // snap once; every round reuses it
    var cents = seeds(vm)
    for (_ <- 1 to iters) cents = update(vm, cents)
    assign(vm, cents).select("vec_id", "cell", "dist")
  }

  /** Exact integer squared distance of `vm` to a centroid literal. */
  private def distTo(cm: Array[Long]): Column =
    expr(s"aggregate(zip_with(vm, array(${cm.mkString(",")}L), " +
      "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)")
      .cast("long")

  /** Assignment under the given centroids: argmin(dist, cell) as an
    * array_min over (dist, cell) structs — struct comparison is
    * lexicographic, so ties go to the lowest cell. One narrow projection.
    */
  private def assign(vm: DataFrame, cents: Seq[(Int, Array[Long])]): DataFrame = {
    val scored = array(cents.map { case (cell, cm) =>
      struct(distTo(cm).as("d"), lit(cell).as("c"))
    }: _*)
    vm.withColumn("m", array_min(scored))
      .select(col("vec_id"), col("vm"),
        col("m.c").as("cell"), col("m.d").as("dist"))
  }

  /** One Lloyd round: assignment → per-cell truncated-mean update.
    * Returns the next centroid map; an emptied cell keeps its previous
    * centroid. The collect is k×64 longs — bounded model state.
    */
  private def update(vm: DataFrame,
      cents: Seq[(Int, Array[Long])]): Seq[(Int, Array[Long])] = {
    val sums = (0 until Dim).map(i => sum(col("vm")(i)).as(s"s$i"))
    val upd = assign(vm, cents)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sums: _*)
      .collect()
      .map { r =>
        val n = r.getLong(1)
        // JVM Long `/` truncates toward zero — identical to Spark `div`
        // and DuckDB `//` on either sign
        r.getInt(0) -> Array.tabulate(Dim)(i => r.getLong(2 + i) / n)
      }.toMap
    cents.map { case (cell, cm) => cell -> upd.getOrElse(cell, cm) }
  }

  /** Seeds: the vectors with vec_id < k (k×64 bounded collect). */
  private def seeds(vm: DataFrame): Seq[(Int, Array[Long])] =
    vm.filter(col("vec_id") < KmK).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq

  /** The distance expression as DuckDB SQL against centroid table `c`. */
  private def distSql: String =
    s"CAST(list_sum(list_transform(range(1, ${Dim + 1}), " +
      "i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i]))) AS BIGINT)"

  /** One unrolled oracle round: assignment from km_c{r-1}, update into
    * km_c{r} (empty cells keep the previous centroid via LEFT JOIN).
    */
  private def roundSql(r: Int): String =
    s"""CREATE OR REPLACE TEMP TABLE km_a$r AS
       |  SELECT vec_id, cell, dist FROM (
       |    SELECT vec_id, cell, dist,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM (SELECT v.vec_id, c.cell, $distSql AS dist
       |          FROM km_v v CROSS JOIN km_c${r - 1} c))
       |  WHERE rn = 1;
       |CREATE OR REPLACE TEMP TABLE km_c$r AS
       |  SELECT p.cell, coalesce(u.cm, p.cm) AS cm
       |  FROM km_c${r - 1} p LEFT JOIN (
       |    SELECT cell, list(sm ORDER BY i) AS cm FROM (
       |      SELECT a.cell, i,
       |             CAST(sum(v.vm[i]) AS BIGINT) // CAST(count(*) AS BIGINT) AS sm
       |      FROM km_a$r a JOIN km_v v USING (vec_id),
       |           range(1, ${Dim + 1}) t(i)
       |      GROUP BY a.cell, i)
       |    GROUP BY cell) u ON u.cell = p.cell;""".stripMargin

  val queries: Seq[Q] = Seq(

    // Final assignment after KmIters full Lloyd rounds: each vector's
    // cell and exact integer squared distance under the final centroids.
    // Oracle-checked cell-for-cell — assignment, every centroid update,
    // and the final scoring all walk the identical integer trajectory.
    Q("q_kmeans_assign",
      s"""$kmScriptPrefix
         |SELECT vec_id, cell, dist FROM ($kmFinalAssignSql)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      kmeansAssignFrom(vmFrame(s, dir)).orderBy("vec_id")
    },

    // Per-cell inertia summary of the SAME oracle-checked Lloyd
    // trajectory: member count and exact integer within-cell squared
    // distance mass — the model-quality diagnostic (elbow curves, empty/
    // degenerate cell detection, rebalance triggers for the IVF index's
    // needsRebalance cousin). One groupBy(cell) past the assignment —
    // k rows out whatever the corpus size.
    Q("q_kmeans_inertia",
      s"""$kmScriptPrefix
         |SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(dist) AS BIGINT) AS inertia,
         |       CAST(max(dist) AS BIGINT) AS max_dist
         |FROM ($kmFinalAssignSql) WHERE rn = 1
         |GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
      kmeansAssignFrom(vmFrame(s, dir))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), sum("dist").as("inertia"),
          max("dist").as("max_dist"))
        .orderBy("cell")
    },

    // PROTOTYPICALITY ranking + outlier pruning (Sorscher et al. 2022,
    // "Beyond neural scaling laws: beating power law scaling via data
    // pruning" — self-supervised prototype metric = distance to the
    // example's cluster centroid): within each cell of the SAME
    // oracle-checked Lloyd trajectory, rank members by exact integer
    // squared distance (rank 1 = most prototypical) and flag the farthest
    // quarter as pruned — the abundant-data regime keeps prototypical
    // mass and drops outliers (the scarce-data regime flips the flag; the
    // rank column serves both). The prune gate is pure integer
    // cross-multiplication (rank·4 > n·3), no fractions. The window
    // partitions by cell — never global.
    Q("q_prototypicality",
      s"""$kmScriptPrefix
         |WITH a AS (
         |  SELECT vec_id, cell, dist FROM ($kmFinalAssignSql) WHERE rn = 1),
         |r AS (
         |  SELECT vec_id, cell, dist,
         |         CAST(row_number() OVER (PARTITION BY cell
         |                ORDER BY dist, vec_id) AS BIGINT) AS proto_rank,
         |         CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
         |  FROM a)
         |SELECT vec_id, cell, dist, proto_rank,
         |       (proto_rank * 4 > n_cell * 3) AS pruned
         |FROM r ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy("dist", "vec_id")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      kmeansAssignFrom(vmFrame(s, dir))
        .select(col("vec_id"), col("cell"), col("dist"),
          row_number().over(w).cast("long").as("proto_rank"),
          count(lit(1)).over(wc).as("n_cell"))
        .select(col("vec_id"), col("cell"), col("dist"), col("proto_rank"),
          (col("proto_rank") * 4 > col("n_cell") * 3).as("pruned"))
        .orderBy("vec_id")
    },

    // PCA BY POWER ITERATION — the missing linear-algebra face of the
    // embedding plane (decorrelation, compression, drift axes), and the
    // third fully ORACLE-CHECKED iterative trajectory after PageRank and
    // Lloyd. Determinism is the km_ mechanism end-to-end: micro-snapped
    // vectors, exact integer mean (trunc-div ≡ both engines), exact
    // integer covariance sums down-scaled by PcCScale, then PcIters
    // max-norm power rounds whose ONE float op per round —
    // w·PcVScale/max|w| — is a correctly-rounded IEEE multiply+divide on
    // identical operands, snapped half-away-from-zero in both engines.
    // Scale shape: exactly TWO corpus aggregates (a 65-column mean pass;
    // the covariance pass fans each row to Dim² products but map-side
    // partials mean the wire carries O(partitions · Dim²), never O(N)),
    // after which every round is pure driver arithmetic on the collected
    // Dim×Dim matrix — bounded model state, ZERO Spark jobs per round
    // (the distinction from the rejected batch-perceptron design, whose
    // 60 epochs each paid a distributed aggregate; see the design note
    // below). The oracle re-derives snap, mean, covariance, and all
    // PcIters rounds as an unrolled pc_ temp-table script.
    Q("q_pca_power",
      s"""$pcScriptPrefix
         |SELECT round, dim, v FROM (
         |${pcTrajSql("pc")})
         |ORDER BY round, dim""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (_, cov) = pcaModel(vmFrame(s, dir))
      pcaTrajectory(cov).zipWithIndex.flatMap { case (v, r) =>
        v.zipWithIndex.map { case (x, j) => (r, j + 1, x) }
      }.toDF("round", "dim", "v").orderBy("round", "dim")
    },

    // SECOND COMPONENT BY DEFLATION — Ĉ₂ = Ĉ − λ̂·v₁v₁ᵀ with the rank-1
    // term as ONE exact integer expression (v₁ᵀĈv₁)·v₁ⱼ·v₁ₖ div (v₁ᵀv₁)²
    // (BigInt on the driver, HUGEINT in the oracle — `//` and BigInt `/`
    // both truncate toward zero, probed), then the same 12 max-norm power
    // rounds on Ĉ₂. On this fixture the top eigenpair is near-degenerate,
    // so v₂ is the deterministic orthogonal companion spanning the top-2
    // subspace (|cos(v₁,v₂)| ≈ 0.04, gated in ClusteringSpec) — exactly
    // what a 2-D compression/visualization consumer wants from a
    // degenerate pair. Still zero Spark jobs past the shared two-pass
    // model state: deflation and the second sweep are driver arithmetic.
    Q("q_pca_deflate",
      s"""$pcScriptPrefix
         |$pc2ScriptSql
         |SELECT round, dim, v FROM (
         |${pcTrajSql("pc2")})
         |ORDER BY round, dim""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (_, cov) = pcaModel(vmFrame(s, dir))
      val v1 = pcaTrajectory(cov).last
      pcaTrajectory(pcaDeflate(cov, v1)).zipWithIndex.flatMap { case (v, r) =>
        v.zipWithIndex.map { case (x, j) => (r, j + 1, x) }
      }.toDF("round", "dim", "v").orderBy("round", "dim")
    },

    // Top-2 principal-component scores under the SAME oracle-checked
    // trajectories: pc_r = Σ (vm − μ)·v_r per vector — the 2-D projection
    // a pipeline stores for embedding compression, outlier gates, drift
    // monitoring, or visualization. One NARROW scan: μ, v₁, v₂ are three
    // Dim-long literal arrays (bounded model state, the kmeans
    // centroid-literal shape), so scoring never shuffles the corpus; all
    // arithmetic exact int64 (|d| ≤ 2·10⁶ · |v| ≤ 10⁴ · 64 ≈ 1.3·10¹²).
    Q("q_pca_project",
      s"""$pcScriptPrefix
         |$pc2ScriptSql
         |SELECT d.vec_id, e.label,
         |       CAST(sum(d.d * w1.v) AS BIGINT) AS pc1,
         |       CAST(sum(d.d * w2.v) AS BIGINT) AS pc2
         |FROM pc_d d JOIN pc_w$PcIters w1 ON d.i = w1.j
         |     JOIN pc2_w$PcIters w2 ON d.i = w2.j
         |     JOIN embeddings e USING (vec_id)
         |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val (mu, cov) = pcaModel(vmOf(emb))
      val v1 = pcaTrajectory(cov).last
      val v2 = pcaTrajectory(pcaDeflate(cov, v1)).last
      def dot(v: Array[Long]): Column =
        expr("aggregate(zip_with(zip_with(" +
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS LONG)), " +
          s"array(${mu.mkString(",")}L), (x, m) -> x - m), " +
          s"array(${v.mkString(",")}L), (d, w) -> d * w), " +
          "0L, (a, b) -> a + b)")
      emb.select(col("vec_id"), col("label"),
        dot(v1).as("pc1"), dot(v2).as("pc2"))
        .orderBy("vec_id")
    },

    // EMBEDDING-DRIFT MONITOR — the consumer that makes the PCA family
    // load-bearing: project two ingest eras onto the FROZEN dominant axis
    // (the q_pca_project scores), bucket each era through a frozen
    // equi-width grid (the q_hist_quantiles sketch mechanism at a
    // drift-monitoring granularity of EdBuckets brackets), and gate the
    // per-bucket mass shift with q_profile_drift's integer
    // cross-multiplication — |after·n_b − before·n_a|·5 > max(before·n_a,
    // 1), relative share change > 20%, never a float compare. The AFTER
    // era at fixture scale is the before corpus with a documented DRIFT
    // INJECTION — every vec_id % 4 = 0 row shifted by 4·v₁ along the
    // dominant axis itself (Δpc1 = 4·Σv₁², ~2.5 grid buckets: the
    // "biased new source" scenario) — deterministic integer arithmetic,
    // so the oracle reproduces it exactly; in production the two eras are
    // two ingest windows and the model/geometry literals come from the
    // baseline era (the histIngest frozen-geometry deployment story).
    // Both statuses surface at every shipped scale: mass near the mode
    // moves between near-equal brackets (undrifted) while slope/tail
    // brackets and the out-of-range OVERFLOW ids (≥ EdBuckets — honest
    // diagnostics, not clamped, exactly the centsHist rule) trip the
    // gate. Scale shape: after the shared two-pass PCA model, ONE narrow
    // literal-array projection scan per era (zero joins — PlanShapeSpec
    // locks the q_pca_project precedent), two ≤(EdBuckets+overflow)-row
    // histogram aggregates, and a bounded full-outer bucket join; the
    // corpus never shuffles. Count cross-products stay ≪ 2^63 for eras
    // under ~2^31 rows each (shares in ppm carry the diagnostic surface;
    // at larger eras pre-divide to ppm before the gate).
    Q("q_embed_drift",
      s"""$edScriptSql
         |$edSelectSql
         |ORDER BY bucket_idx""".stripMargin) { (s, dir) =>
      embedDriftBatchReport(s, dir)
    },

    // DRIFT ALERTS — the composition that closes the monitoring loop:
    // q_embed_drift's per-bucket report gated down to the rows worth
    // PAGING on — drifted AND carrying at least [[MinAlertPpm]] (1%) of
    // either era's mass, so a one-row bucket in a million-row era can
    // never fire (the q_profile_drift noise-floor idea on the embedding
    // plane, all-integer). The surviving rows are the needsRebuild
    // trigger for the persisted vector indexes ([[embedDriftHealth]] →
    // the ivfPqHealth retrain shape); the same kernel runs live over the
    // streaming drift feed (Streams.embedDriftAlertIngest, batch ≡
    // stream spec-gated). Plan shape: one filter over the bounded
    // ≤(EdBuckets+overflow)-row report — nothing corpus-sized moves.
    Q("q_drift_alerts",
      s"""$edScriptSql
         |SELECT * FROM ($edSelectSql) r
         |WHERE drifted AND (share_before_ppm >= $MinAlertPpm
         |   OR share_after_ppm >= $MinAlertPpm)
         |ORDER BY bucket_idx""".stripMargin) { (s, dir) =>
      embedDriftAlerts(embedDriftBatchReport(s, dir))
    },

    // DRIFT-TTL TOMBSTONES — the alert → retirement composition as a
    // declared relation: the before-era vec_ids whose frozen-axis bucket
    // is a PAGED (q_drift_alerts) bucket, i.e. exactly the rows
    // [[driftRetireTombstones]] routes into Similarity.retireVecs on the
    // persisted IVF/IVFADC indexes (retire stale rows of regions whose
    // distribution shifted instead of retraining over them —
    // ClusteringSpec gates retire ≡ frozen-model rebuild of the
    // survivors end-to-end on both index layouts). Plan shape: the
    // shared two-pass PCA model, ONE narrow zero-join scoring scan of
    // the era, then a broadcast left-semi join against the bounded
    // ≤(EdBuckets+overflow)-row alert frame — the corpus never shuffles.
    // Oracle: same bucket CASE over the scored before era (ed_b), alert
    // set derived from the shared report SELECT.
    Q("q_drift_tombstones",
      s"""$edScriptSql
         |SELECT b.vec_id
         |FROM ed_b b, ed_g g
         |WHERE (CASE WHEN ((b.pc1 - g.lo) * $EdBuckets) % g.width < 0
         |       THEN ((b.pc1 - g.lo) * $EdBuckets) // g.width - 1
         |       ELSE ((b.pc1 - g.lo) * $EdBuckets) // g.width END) IN (
         |  SELECT bucket_idx FROM ($edSelectSql) r
         |  WHERE drifted AND (share_before_ppm >= $MinAlertPpm
         |     OR share_after_ppm >= $MinAlertPpm))
         |ORDER BY b.vec_id""".stripMargin) { (s, dir) =>
      val (before, after, lo, width) = embedDriftBatchParts(s, dir)
      val report = embedDriftReport(pcScoreHist(before, lo, width),
        pcScoreHist(after, lo, width))
      driftRetireTombstones(before, embedDriftAlerts(report), lo, width)
        .orderBy("vec_id")
    },

    // TOP-K PCA BASIS — repeated deflation to PcK = 4 components, every
    // direction exactly the converged max-norm power iterate of the
    // successively deflated covariance (the q_pca_deflate mechanism
    // chained: deflation r subtracts component r's exact-integer rank-1
    // Rayleigh term from Ĉ_r, HUGEINT in the oracle / BigInt on the
    // driver). Still ZERO Spark jobs past the shared two-pass model
    // state — all PcK × PcIters rounds are driver arithmetic on the
    // 64×64 matrix; the oracle grows one pc{r}_ temp-table block per
    // component. ClusteringSpec gates per-component Rayleigh ordering
    // (non-increasing within the near-degenerate slack) and pairwise
    // near-orthogonality of the basis.
    Q("q_pca_topk",
      s"""$pcScriptPrefix
         |${pcDeflateScriptSql("pc", "pc2")}
         |${pcDeflateScriptSql("pc2", "pc3")}
         |${pcDeflateScriptSql("pc3", "pc4")}
         |SELECT component, dim, v FROM (
         |  SELECT CAST(1 AS INTEGER) AS component, CAST(j AS INTEGER) AS dim, v
         |  FROM pc_w$PcIters
         |  UNION ALL SELECT CAST(2 AS INTEGER), CAST(j AS INTEGER), v
         |  FROM pc2_w$PcIters
         |  UNION ALL SELECT CAST(3 AS INTEGER), CAST(j AS INTEGER), v
         |  FROM pc3_w$PcIters
         |  UNION ALL SELECT CAST(4 AS INTEGER), CAST(j AS INTEGER), v
         |  FROM pc4_w$PcIters)
         |ORDER BY component, dim""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (_, cov0) = pcaModel(vmFrame(s, dir))
      val comps = Seq.newBuilder[Array[Long]]
      var c = cov0
      for (_ <- 1 to PcK) {
        val v = pcaTrajectory(c).last
        comps += v
        c = pcaDeflate(c, v)
      }
      comps.result().zipWithIndex.flatMap { case (v, ci) =>
        v.zipWithIndex.map { case (x, j) => (ci + 1, j + 1, x) }
      }.toDF("component", "dim", "v").orderBy("component", "dim")
    },

    // BLOCK POWER ITERATION — the k ≫ 4 basis path: where q_pca_topk's
    // deflation chain is sequential in k (component r+1 cannot start
    // until r converges), simultaneous orthogonal iteration advances all
    // PcBlockK = 8 columns per round and orders them with an in-round
    // integer Gram–Schmidt (see pcaBlockTrajectory for the arithmetic
    // contract the oracle mirrors term-for-term). The full trajectory —
    // every round × component × dim — is the oracle-compared relation;
    // ClusteringSpec gates pairwise near-orthogonality and Rayleigh
    // ordering of the final block. Still ZERO Spark jobs past the shared
    // two-pass covariance model.
    Q("q_pca_block",
      s"""$pcScriptPrefix
         |$pcBlockSeedSql
         |${(1 to PcBlockIters).map(pcBlockRoundSql).mkString("\n")}
         |SELECT round, component, dim, v FROM (
         |  $pcBlockTrajSql
         |) ORDER BY round, component, dim""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (_, cov) = pcaModel(vmFrame(s, dir))
      pcaBlockTrajectory(cov).zipWithIndex.flatMap { case (block, r) =>
        block.zipWithIndex.toSeq.flatMap { case (v, c) =>
          v.zipWithIndex.toSeq.map { case (x, j) => (r, c + 1, j + 1, x) }
        }
      }.toDF("round", "component", "dim", "v")
        .orderBy("round", "component", "dim")
    }
  )

  /** Drift-grid brackets — coarser than the 256-bucket quantile sketch:
    * a drift gate wants enough mass per bracket that a 20% share move is
    * signal, not noise.
    */
  final val EdBuckets = 16

  /** A vector's frozen-axis PC score as ONE Column over `embedding`:
    * Σ (vm − μ)·v with μ, v as Dim-long literal arrays — the narrow
    * zero-join projection PlanShapeSpec locks; shared by q_embed_drift
    * and the streaming drift feed.
    */
  private[graft] def pcScoreCol(mu: Array[Long], v: Array[Long]): Column =
    expr("aggregate(zip_with(zip_with(" +
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS LONG)), " +
      s"array(${mu.mkString(",")}L), (x, m) -> x - m), " +
      s"array(${v.mkString(",")}L), (d, w) -> d * w), " +
      "0L, (a, b) -> a + b)")

  /** PC-score histogram under a FROZEN (lo, width) grid — the
    * q_hist_quantiles bucket map at drift granularity; out-of-range
    * scores land in honest under/overflow bucket ids via the SAME
    * floor-division rule as centsHist ([[graft.ops.Sketches]]
    * .flooredBucketSql). The batch q_embed_drift derives lo = min of the
    * before era and never sees pc1 < lo, but the streaming drift feed
    * ([[graft.streaming.Streams]].embedDriftIngest) freezes (lo, width)
    * from a baseline era — new-era scores drifting BELOW lo must land in
    * negative diagnostic buckets, not silently merge into bucket 0.
    */
  private[graft] def pcScoreHist(scored: DataFrame, lo: Long,
      width: Long): DataFrame =
    scored.groupBy(
      expr(Sketches.flooredBucketSql("pc1", lo, EdBuckets, width))
        .as("bucket_idx"))
      .agg(count(lit(1)).as("cnt"))

  /** The drift report over two bucket grids: per-bucket counts, shares
    * in exact ppm, and the integer cross-multiplied >20% share gate.
    * Era totals are derived from the grids themselves (two bounded-frame
    * aggregates broadcast back), so the kernel serves both the batch
    * query (equal-size eras) and the streaming feed (after-era total
    * grows per trigger). Count cross-products stay ≪ 2^63 for eras
    * under ~2^31 rows; pre-divide to ppm beyond that.
    */
  private[graft] def embedDriftReport(hb: DataFrame,
      ha: DataFrame): DataFrame = {
    val tb = hb.agg(coalesce(sum("cnt"), lit(0L)).as("nb"))
    val ta = ha.agg(coalesce(sum("cnt"), lit(0L)).as("na"))
    hb.withColumnRenamed("cnt", "cb")
      .join(ha.withColumnRenamed("cnt", "ca"), Seq("bucket_idx"), "full_outer")
      .crossJoin(broadcast(tb)).crossJoin(broadcast(ta))
      .select(col("bucket_idx"),
        coalesce(col("cb"), lit(0L)).as("cnt_before"),
        coalesce(col("ca"), lit(0L)).as("cnt_after"),
        col("nb"), col("na"))
      .select(col("bucket_idx"), col("cnt_before"), col("cnt_after"),
        expr("cnt_before * 1000000 div greatest(nb, 1L)")
          .as("share_before_ppm"),
        expr("cnt_after * 1000000 div greatest(na, 1L)")
          .as("share_after_ppm"),
        (abs(col("cnt_after") * col("nb") - col("cnt_before") * col("na")) * 5 >
          greatest(col("cnt_before") * col("na"), lit(1L))).as("drifted"))
      .orderBy("bucket_idx")
  }

  /** Noise floor for drift ALERTS: a drifted bucket pages only when it
    * carries at least this share (ppm) of either era's mass — 1%.
    */
  final val MinAlertPpm = 10000L

  /** The q_embed_drift oracle script body (temp tables through the two
    * era grids), shared with q_drift_alerts.
    */
  private def edScriptSql: String =
    s"""$pcScriptPrefix
       |CREATE OR REPLACE TEMP TABLE ed_b AS
       |  SELECT d.vec_id, CAST(sum(d.d * w.v) AS BIGINT) AS pc1
       |  FROM pc_d d JOIN pc_w$PcIters w ON d.i = w.j GROUP BY 1;
       |CREATE OR REPLACE TEMP TABLE ed_a AS
       |  SELECT vec_id, pc1 + CASE WHEN vec_id % 4 = 0
       |    THEN 4 * (SELECT CAST(sum(v * v) AS BIGINT) FROM pc_w$PcIters)
       |    ELSE 0 END AS pc1 FROM ed_b;
       |CREATE OR REPLACE TEMP TABLE ed_g AS
       |  SELECT min(pc1) AS lo, max(pc1) - min(pc1) + 1 AS width,
       |         (SELECT CAST(count(*) AS BIGINT) FROM ed_b) AS nb,
       |         (SELECT CAST(count(*) AS BIGINT) FROM ed_a) AS na
       |  FROM ed_b;
       |CREATE OR REPLACE TEMP TABLE ed_hb AS
       |  SELECT CASE WHEN ((pc1 - lo) * $EdBuckets) % width < 0
       |         THEN (pc1 - lo) * $EdBuckets // width - 1
       |         ELSE (pc1 - lo) * $EdBuckets // width END AS bucket_idx,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM ed_b, ed_g GROUP BY 1;
       |CREATE OR REPLACE TEMP TABLE ed_ha AS
       |  SELECT CASE WHEN ((pc1 - lo) * $EdBuckets) % width < 0
       |         THEN (pc1 - lo) * $EdBuckets // width - 1
       |         ELSE (pc1 - lo) * $EdBuckets // width END AS bucket_idx,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM ed_a, ed_g GROUP BY 1;""".stripMargin

  /** The q_embed_drift oracle report SELECT (no ORDER BY), shared with
    * q_drift_alerts' gated form.
    */
  private def edSelectSql: String =
    s"""SELECT COALESCE(hb.bucket_idx, ha.bucket_idx) AS bucket_idx,
       |       CAST(COALESCE(hb.cnt, 0) AS BIGINT) AS cnt_before,
       |       CAST(COALESCE(ha.cnt, 0) AS BIGINT) AS cnt_after,
       |       CAST(COALESCE(hb.cnt, 0) * 1000000 // g.nb AS BIGINT)
       |         AS share_before_ppm,
       |       CAST(COALESCE(ha.cnt, 0) * 1000000 // g.na AS BIGINT)
       |         AS share_after_ppm,
       |       (abs(COALESCE(ha.cnt, 0) * g.nb - COALESCE(hb.cnt, 0) * g.na)
       |          * 5 > greatest(COALESCE(hb.cnt, 0) * g.na, 1)) AS drifted
       |FROM ed_hb hb FULL OUTER JOIN ed_ha ha USING (bucket_idx), ed_g g"""
      .stripMargin

  /** The q_embed_drift batch fixture's SCORED ERAS and frozen grid —
    * (before, after, lo, width): the documented drift injection on the
    * after era, the grid frozen from the before era only. Shared by the
    * report query, the alert composition, and the tombstone TTL query
    * (which needs the scored before era and the grid, not just the
    * bucket report).
    */
  private[graft] def embedDriftBatchParts(s: SparkSession,
      dir: String): (DataFrame, DataFrame, Long, Long) = {
    val emb = Tables(s, dir, "embeddings")
    val (mu, cov) = pcaModel(vmOf(emb))
    val v1 = pcaTrajectory(cov).last
    val sumSq = v1.map(x => x * x).sum // ≤ Dim·PcVScale² ≈ 6.4e9, exact
    val before = emb.select(col("vec_id"), pcScoreCol(mu, v1).as("pc1"))
    val after = before.select(col("vec_id"),
      (col("pc1") + when(col("vec_id") % 4 === 0, lit(4L * sumSq))
        .otherwise(lit(0L))).as("pc1"))
    // frozen grid: two scalars of bounded model state (the
    // q_hist_quantiles min/max collect), from the BEFORE era only
    val g = before.agg(min("pc1"), max("pc1")).head()
    require(!g.isNullAt(0),
      "q_embed_drift: empty before era — no drift baseline to freeze")
    (before, after, g.getLong(0), g.getLong(1) - g.getLong(0) + 1)
  }

  /** The q_embed_drift batch pipeline (documented drift injection, grid
    * frozen from the before era) — shared by the report query and the
    * alert composition.
    */
  private[graft] def embedDriftBatchReport(s: SparkSession,
      dir: String): DataFrame = {
    val (before, after, lo, width) = embedDriftBatchParts(s, dir)
    embedDriftReport(pcScoreHist(before, lo, width),
      pcScoreHist(after, lo, width))
  }

  /** Alert rows of a drift report: drifted AND at least [[MinAlertPpm]]
    * of either era's mass — one filter on the bounded report frame.
    */
  private[graft] def embedDriftAlerts(report: DataFrame): DataFrame =
    report.filter(col("drifted") &&
      (col("share_before_ppm") >= MinAlertPpm ||
        col("share_after_ppm") >= MinAlertPpm))

  /** Tombstones for the drift-alert → retirement composition: the ids
    * of an era's rows whose frozen-axis bucket is a PAGED (alert)
    * bucket — the embedding-plane TTL feeding [[graft.ops.Similarity]]
    * .retireVecs (retire stale rows of regions whose distribution
    * shifted, instead of retraining over them). One narrow semi-join of
    * the scored era against the broadcast ≤(EdBuckets+overflow)-row
    * alert frame — the corpus never shuffles; ClusteringSpec gates the
    * composed path end-to-end (retire ≡ frozen-model rebuild of the
    * survivors).
    */
  private[graft] def driftRetireTombstones(scored: DataFrame,
      alerts: DataFrame, lo: Long, width: Long): DataFrame =
    scored.withColumn("bucket_idx",
        expr(Sketches.flooredBucketSql("pc1", lo, EdBuckets, width)))
      .join(broadcast(alerts.select("bucket_idx")), Seq("bucket_idx"),
        "left_semi")
      .select("vec_id")

  /** The composed health gate on the embedding plane: how many buckets
    * page, and how much after-era mass sits in them. `needsRebuild`
    * closes the loop to the persisted-index lifecycle — fire the
    * ivfPqHealth-style retrain/re-index when ANY alert survives the
    * noise floor (the per-bucket 20% rule + 1% mass floor already
    * filtered the noise).
    */
  final case class EmbedDriftHealth(alertBuckets: Long,
      alertMassPpm: Long) {
    def needsRebuild: Boolean = alertBuckets > 0L
  }

  /** [[EmbedDriftHealth]] of a drift report — one O(1)-row aggregate
    * over the bounded alert frame.
    */
  private[graft] def embedDriftHealth(report: DataFrame): EmbedDriftHealth = {
    val r = embedDriftAlerts(report)
      .agg(count(lit(1)).as("n"),
        coalesce(sum("share_after_ppm"), lit(0L)).as("mass"))
      .head()
    EmbedDriftHealth(r.getLong(0), r.getLong(1))
  }

  /** Components for the top-k PCA basis (q_pca_topk). */
  final val PcK = 4

  /** The shared oracle-script prefix: micro-snap, seeds, all Lloyd
    * rounds materialized (km_v … km_c{KmIters}).
    */
  private def kmScriptPrefix: String =
    s"""CREATE OR REPLACE TEMP TABLE km_v AS
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
       |  FROM embeddings;
       |CREATE OR REPLACE TEMP TABLE km_c0 AS
       |  SELECT CAST(vec_id AS INTEGER) AS cell, vm AS cm
       |  FROM km_v WHERE vec_id < $KmK;
       |${(1 to KmIters).map(roundSql).mkString("\n")}""".stripMargin

  /** Final-round argmin assignment subquery (vec_id, cell, dist, rn). */
  private def kmFinalAssignSql: String =
    s"""SELECT vec_id, cell, dist,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY dist, cell) AS rn
       |  FROM (SELECT v.vec_id, c.cell, $distSql AS dist
       |        FROM km_v v CROSS JOIN km_c$KmIters c)""".stripMargin

  // ---- PCA (power iteration) ----------------------------------------------

  /** Half-away-from-zero rounding — the Spark round()/DuckDB round()
    * convention. math.round is floor(x + 0.5), which differs on negative
    * .5 ties (math.round(-2.5) = -2; both engines give -3).
    */
  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** Distributed PCA model state over an explicit (vec_id, vm) frame:
    * the exact integer per-dimension mean (trunc-div, ≡ both engines)
    * and the PcCScale-down-scaled integer covariance matrix. Exactly two
    * corpus aggregates; only the Dim-row mean and Dim×Dim covariance
    * reach the driver (bounded model state). The covariance pass fans
    * each row to Dim² (j, k, dj·dk) rows through two chained
    * posexplodes — map-side partial aggregation collapses them to
    * O(partitions · Dim²) on the wire; the per-row Dim² multiply CPU is
    * inherent to covariance (every implementation pays it), and a typed
    * Array[Long](Dim²)-buffer Aggregator is the documented escape hatch
    * if the fan-out's row overhead ever dominates.
    *
    * WIDE-DIMENSION POSTURE (dim ≫ 64): the kernel is dim-parametric
    * ([[pcaModelOf]]); ScaleProbe measures it at dim = 512 (the wire
    * stays O(partitions · dim²) via map-side collapse, the driver matrix
    * 512² longs = 2 MB — still bounded model state), and SCALING.md
    * records the row. For 768–4096-dim production embeddings the SHIPPED
    * route is the q_rand_proj pre-step: random-project to ProjDim first,
    * then run this machinery on the narrow frame — covariance cost is
    * quadratic in width, so projecting before the Dim² fan-out is the
    * scale lever, not a wider fan-out.
    */
  private[graft] def pcaModel(vmIn: DataFrame): (Array[Long], Array[Array[Long]]) =
    pcaModelOf(vmIn, Dim)

  /** [[pcaModel]] over an explicit width — identical arithmetic; the
    * ScaleProbe wide-dimension entry point.
    */
  private[graft] def pcaModelOf(vmIn: DataFrame,
      dim: Int): (Array[Long], Array[Array[Long]]) = {
    val vm = vmIn.localCheckpoint() // snap once; both aggregates reuse it
    val sums = (0 until dim).map(i => sum(col("vm")(i)).as(s"s$i"))
    val srow = vm.agg(count(lit(1)).as("n"), sums: _*).head()
    val n = srow.getLong(0)
    // JVM Long `/` truncates toward zero — identical to Spark `div` and
    // DuckDB `//` on either sign (the kmeans update rule)
    val mu = Array.tabulate(dim)(i => srow.getLong(1 + i) / n)
    val centered = vm.select(
      expr(s"zip_with(vm, array(${mu.mkString(",")}L), (x, m) -> x - m)")
        .as("dv"))
    val cov = centered
      .select(posexplode(col("dv")).as(Seq("j", "dj")), col("dv"))
      .select(col("j"), col("dj"), posexplode(col("dv")).as(Seq("k", "dk")))
      .groupBy("j", "k")
      .agg(sum(col("dj") * col("dk")).as("sdd"))
      .select(col("j"), col("k"), expr(s"sdd div $PcCScale").as("c"))
      .collect()
    val m = Array.ofDim[Long](dim, dim)
    cov.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    (mu, m)
  }

  /** The PcIters-round max-norm power-iteration trajectory (round 0 =
    * the all-PcVScale seed). Pure driver arithmetic over the Dim×Dim
    * bounded model state — no Spark job per round. The one float op per
    * round, (w · PcVScale) / max|w|, is a correctly-rounded IEEE
    * multiply+divide on identical operands in JVM, Spark, and DuckDB;
    * the result snaps half-away-from-zero back to integers, so every
    * round starts from identical state in both engines. Covariance is
    * PSD, so the dominant-eigenvector iterate never flips sign.
    */
  private[graft] def pcaTrajectory(cov: Array[Array[Long]]): Seq[Array[Long]] = {
    var v = Array.fill(Dim)(PcVScale)
    val traj = Seq.newBuilder[Array[Long]]
    traj += v.clone()
    for (_ <- 1 to PcIters) {
      val w = Array.tabulate(Dim) { j =>
        var acc = 0L
        for (k <- 0 until Dim) acc += cov(j)(k) * v(k)
        acc
      }
      val ma = w.map(math.abs).max
      require(ma > 0,
        "zero covariance matvec — degenerate input (all vectors equal); " +
          "the DuckDB oracle would divide by zero here, so fail loudly")
      v = w.map(x => roundHalfAway(x.toDouble * PcVScale.toDouble / ma.toDouble))
      traj += v.clone()
    }
    traj.result()
  }

  /** One unrolled oracle power round on covariance table `$p_c`: matvec
    * into `$p`_m{r}, max-norm snap into `$p`_w{r}.
    */
  private def pcRoundSql(p: String, r: Int): String =
    s"""CREATE OR REPLACE TEMP TABLE ${p}_m$r AS
       |  SELECT c.j, CAST(sum(c.c * w.v) AS BIGINT) AS w
       |  FROM ${p}_c c JOIN ${p}_w${r - 1} w ON c.k = w.j GROUP BY c.j;
       |CREATE OR REPLACE TEMP TABLE ${p}_w$r AS
       |  SELECT j, CAST(round(w * $PcVScale.0 /
       |    (SELECT max(abs(w)) FROM ${p}_m$r)) AS BIGINT) AS v
       |  FROM ${p}_m$r;""".stripMargin

  /** The all-PcVScale seed table for prefix `$p`. */
  private def pcSeedSql(p: String): String =
    s"""CREATE OR REPLACE TEMP TABLE ${p}_w0 AS
       |  SELECT i AS j, CAST($PcVScale AS BIGINT) AS v
       |  FROM range(1, ${Dim + 1}) t(i);""".stripMargin

  /** The shared pc_ oracle-script prefix: micro-snap, exact mean,
    * centered frame, down-scaled covariance, seed, all power rounds.
    */
  private def pcScriptPrefix: String =
    s"""CREATE OR REPLACE TEMP TABLE pc_v AS
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
       |  FROM embeddings;
       |CREATE OR REPLACE TEMP TABLE pc_mu AS
       |  SELECT i, CAST(sum(vm[i]) AS BIGINT) //
       |         (SELECT CAST(count(*) AS BIGINT) FROM pc_v) AS mu
       |  FROM pc_v, range(1, ${Dim + 1}) t(i) GROUP BY i;
       |CREATE OR REPLACE TEMP TABLE pc_d AS
       |  SELECT vec_id, i, vm[i] - mu AS d
       |  FROM pc_v, range(1, ${Dim + 1}) t(i) JOIN pc_mu USING (i);
       |CREATE OR REPLACE TEMP TABLE pc_c AS
       |  SELECT a.i AS j, b.i AS k,
       |         CAST(sum(a.d * b.d) AS BIGINT) // $PcCScale AS c
       |  FROM pc_d a JOIN pc_d b USING (vec_id) GROUP BY 1, 2;
       |${pcSeedSql("pc")}
       |${(1 to PcIters).map(pcRoundSql("pc", _)).mkString("\n")}""".stripMargin

  /** Deflation + the component-2 power rounds, appended after
    * [[pcScriptPrefix]]: Ĉ₂ = Ĉ − (v₁ᵀĈv₁)·v₁v₁ᵀ div (v₁ᵀv₁)², every
    * product in HUGEINT (the Rayleigh numerator peaks ~10²⁵, far past
    * int64 but far under HUGEINT; `//` truncates toward zero on HUGEINT
    * exactly like BigInt division on the driver — probed), the deflated
    * entries back in int64 range by construction.
    */
  private def pc2ScriptSql: String = pcDeflateScriptSql("pc", "pc2")

  /** The deflation step parametrized over (prev, next) prefixes — Ĉ_next
    * = Ĉ_prev − λ̂·vvᵀ with v = prev's converged direction, then next's
    * own power rounds. Chaining it grows one pc{r}_ block per component:
    * the q_pca_topk oracle.
    */
  private def pcDeflateScriptSql(prev: String, next: String): String =
    s"""CREATE OR REPLACE TEMP TABLE ${next}_rs AS
       |  SELECT (SELECT CAST(sum(CAST(a.v AS HUGEINT) * c.c * b.v) AS HUGEINT)
       |          FROM ${prev}_c c JOIN ${prev}_w$PcIters a ON c.j = a.j
       |                      JOIN ${prev}_w$PcIters b ON c.k = b.j) AS r,
       |         (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
       |          FROM ${prev}_w$PcIters) AS s;
       |CREATE OR REPLACE TEMP TABLE ${next}_c AS
       |  SELECT c.j, c.k,
       |         c.c - CAST((rs.r * a.v * b.v) // (rs.s * rs.s) AS BIGINT) AS c
       |  FROM ${prev}_c c JOIN ${prev}_w$PcIters a ON c.j = a.j
       |              JOIN ${prev}_w$PcIters b ON c.k = b.j, ${next}_rs rs;
       |${pcSeedSql(next)}
       |${(1 to PcIters).map(pcRoundSql(next, _)).mkString("\n")}""".stripMargin

  /** The trajectory of prefix `$p` as one relation: (round, dim, v) for
    * rounds 0..PcIters.
    */
  private def pcTrajSql(p: String): String =
    (0 to PcIters).map(r =>
      s"SELECT CAST($r AS INTEGER) AS round, CAST(j AS INTEGER) AS dim, v FROM ${p}_w$r")
      .mkString("\nUNION ALL ")

  /** Driver-side deflation twin of [[pc2ScriptSql]]: subtract the rank-1
    * dominant term from the covariance. BigInt throughout — the numerator
    * R·v₁ⱼ·v₁ₖ peaks ~10²⁵ — with BigInt `/` truncation matching DuckDB
    * HUGEINT `//` on either sign.
    */
  private[graft] def pcaDeflate(cov: Array[Array[Long]],
      v1: Array[Long]): Array[Array[Long]] = {
    var rAcc = BigInt(0)
    for (j <- 0 until Dim; k <- 0 until Dim)
      rAcc += BigInt(v1(j)) * cov(j)(k) * v1(k)
    val s  = v1.map(x => BigInt(x) * x).sum
    val s2 = s * s
    Array.tabulate(Dim, Dim)((j, k) =>
      cov(j)(k) - ((rAcc * v1(j) * v1(k)) / s2).toLong)
  }

  /** Basis width and rounds for the BLOCK iteration (q_pca_block). */
  final val PcBlockK     = 8
  final val PcBlockIters = 6

  /** SIMULTANEOUS ORTHOGONAL ITERATION — the wide-basis replacement for
    * the sequential-in-k deflation chain (q_pca_topk): all [[PcBlockK]]
    * columns advance together each round (one block matvec), then a
    * modified Gram–Schmidt re-orthogonalization against the CURRENT
    * round's already-snapped columns orders the block (Golub & Van Loan
    * §8.2's orthogonal iteration, integer-exact). Arithmetic contract,
    * mirrored term-for-term by the oracle script: matvec in int64 (the
    * pcaTrajectory budget), projections in BigInt/HUGEINT with
    * truncating division (the pcaDeflate rule — num·u_j can reach
    * ~10²⁷), snap = round-half-away(w·PcVScale/max|w|) on doubles (the
    * pcRoundSql rule). Seeds are the k disjoint dim-comb indicators
    * ((j mod k) = c — orthogonal by construction). Zero Spark jobs past
    * the shared two-pass covariance model: all k×iters rounds are
    * driver arithmetic on the 64×64 matrix. Degenerate input (rank
    * below the basis width) fails loudly at the zero-column snap.
    */
  private[graft] def pcaBlockTrajectory(cov: Array[Array[Long]],
      k: Int = PcBlockK,
      iters: Int = PcBlockIters): Seq[Array[Array[Long]]] = {
    var u = Array.tabulate(k, Dim)((c, j) => if (j % k == c) PcVScale else 0L)
    val traj = Seq.newBuilder[Array[Array[Long]]]
    traj += u.map(_.clone())
    for (_ <- 1 to iters) {
      val next = Array.ofDim[Long](k, Dim)
      for (c <- 0 until k) {
        val w0 = Array.tabulate(Dim) { j =>
          var acc = 0L
          for (p <- 0 until Dim) acc += cov(j)(p) * u(c)(p)
          acc
        }
        var g = w0.map(BigInt(_))
        for (q <- 0 until c) {
          val uq = next(q)
          var num = BigInt(0); var den = BigInt(0)
          for (j <- 0 until Dim) {
            num += g(j) * uq(j)
            den += BigInt(uq(j)) * uq(j)
          }
          require(den > 0, "zero block column during orthogonalization")
          g = Array.tabulate(Dim)(j => g(j) - (num * uq(j)) / den)
        }
        val ma = g.map(_.abs).max
        require(ma > 0,
          "zero block column — input rank below the requested basis width")
        val maD = ma.toDouble
        next(c) = g.map(x =>
          roundHalfAway(x.toDouble * PcVScale.toDouble / maD))
      }
      u = next
      traj += u.map(_.clone())
    }
    traj.result()
  }

  /** Oracle seeds for the block: k disjoint indicator combs. */
  private def pcBlockSeedSql: String =
    (1 to PcBlockK).map(c =>
      s"""CREATE OR REPLACE TEMP TABLE pb_w0_$c AS
         |  SELECT i AS j, CAST(CASE WHEN (i - 1) % $PcBlockK = ${c - 1}
         |    THEN $PcVScale ELSE 0 END AS BIGINT) AS v
         |  FROM range(1, ${Dim + 1}) t(i);""".stripMargin).mkString("\n")

  /** One unrolled oracle block round: per column, matvec (BIGINT, the
    * pcRoundSql budget), the MGS projection chain against this round's
    * snapped columns (HUGEINT, truncating `//` — the pcDeflateScriptSql
    * rule), then the max-norm snap.
    */
  private def pcBlockRoundSql(r: Int): String =
    (1 to PcBlockK).map { c =>
      val mv =
        s"""CREATE OR REPLACE TEMP TABLE pb_m${r}_$c AS
           |  SELECT cc.j, CAST(sum(cc.c * w.v) AS BIGINT) AS w
           |  FROM pc_c cc JOIN pb_w${r - 1}_$c w ON cc.k = w.j GROUP BY cc.j;
           |CREATE OR REPLACE TEMP TABLE pb_g${r}_${c}_0 AS
           |  SELECT j, CAST(w AS HUGEINT) AS w FROM pb_m${r}_$c;"""
          .stripMargin
      val projs = (1 until c).map { q =>
        s"""CREATE OR REPLACE TEMP TABLE pb_g${r}_${c}_$q AS
           |  SELECT g.j, g.w -
           |    (SELECT CAST(sum(g2.w * u.v) AS HUGEINT)
           |     FROM pb_g${r}_${c}_${q - 1} g2
           |     JOIN pb_w${r}_$q u ON g2.j = u.j)
           |    * CAST(u1.v AS HUGEINT) //
           |    (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
           |     FROM pb_w${r}_$q) AS w
           |  FROM pb_g${r}_${c}_${q - 1} g JOIN pb_w${r}_$q u1 ON g.j = u1.j;"""
          .stripMargin
      }.mkString("\n")
      val snap =
        s"""CREATE OR REPLACE TEMP TABLE pb_w${r}_$c AS
           |  SELECT j, CAST(round(CAST(w AS DOUBLE) * $PcVScale.0 /
           |    (SELECT CAST(max(abs(w)) AS DOUBLE)
           |     FROM pb_g${r}_${c}_${c - 1})) AS BIGINT) AS v
           |  FROM pb_g${r}_${c}_${c - 1};""".stripMargin
      Seq(mv, projs, snap).filter(_.nonEmpty).mkString("\n")
    }.mkString("\n")

  /** The full block-trajectory relation for the oracle's final SELECT. */
  private def pcBlockTrajSql: String =
    (0 to PcBlockIters).flatMap(r => (1 to PcBlockK).map(c =>
      s"SELECT CAST($r AS INTEGER) AS round, CAST($c AS INTEGER) AS component, " +
        s"CAST(j AS INTEGER) AS dim, v FROM pb_w${r}_$c"))
      .mkString("\n  UNION ALL ")
}

// DESIGN NOTE (probed, rejected): a distributed batch perceptron over the
// embeddings was prototyped with the km_ trajectory mechanism (micro-snapped
// vectors, one 65-column filtered aggregate per epoch, unrolled temp-table
// oracle) and was oracle-exact — but the `label` column carries no linear
// signal (a least-squares probe also collapses to the majority class), so
// the trained model converged to the trivial all-negative predictor, and a
// separable synthetic target needed ~60 driver-synchronous epochs (the
// anti-pattern rejected for PQ codebook training). The supervised-training
// surface ships as the one-shuffle Naive Bayes classifier in [[LM]]
// (q_naive_bayes_lang) instead, which genuinely learns on this corpus.
