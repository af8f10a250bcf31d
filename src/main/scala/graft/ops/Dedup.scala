package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Hashing
import graft.functions.exprs._

/** Near-duplicate detection for a training-data pipeline: document
  * fingerprinting, MinHash signatures + LSH banding, SimHash, and exact
  * token-set Jaccard. The per-document kernels (PolyHash/SimHash30) are
  * codegen'd Catalyst expressions ([[graft.functions]]); the oracle mirrors
  * them with DuckDB list_reduce/list_transform lambdas.
  *
  * Scale shape: signatures are computed per-row (narrow, no shuffle);
  * LSH candidate generation shuffles only (band, key) pairs — the classic
  * shingle→minhash→band→bucket-join layout that survives 1000 executors.
  */
object Dedup {

  // 16 permutations in 2 bands of 8: LSH collision threshold ≈ (1/b)^(1/r)
  // ≈ 0.92 — tuned high because the synthetic corpus shares a tiny
  // vocabulary (median pairwise Jaccard ≈ 0.65; 4-row bands would make
  // nearly every pair a candidate).
  final val NumPerms   = 16
  final val BandRows   = 8
  final val NumBands   = NumPerms / BandRows
  /** Candidate prefilter: signature components agreeing (estimates Jaccard). */
  final val MinSigAgree = 14
  final val JaccardTau  = 0.9

  // ---- Spark side ---------------------------------------------------------

  private def toks: Column  = split(col("text"), " ")
  private def dtoks: Column = array_distinct(toks)
  /** Per-token 30-bit polynomial hashes (distinct tokens → set semantics). */
  private def tokenHashes: Column = transform(dtoks, t => poly_hash(t))

  /** MinHash signature: sig_i = min over tokens of (h*(2i+1) + (101i+17)) mod P. */
  private def minhashSigsOf(hashes: Column): Column =
    transform(sequence(lit(0), lit(NumPerms - 1)), i =>
      array_min(transform(hashes, h =>
        (h * (i * 2 + 1) + (i * 101 + 17)) % Hashing.Mod)))
  private def minhashSigs: Column = minhashSigsOf(tokenHashes)

  /** Band keys of a signature column: comma-joined 8-value slices. */
  private def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)), b =>
      concat_ws(",", transform(slice(sig, b * BandRows + 1, lit(BandRows)),
        x => x.cast("string"))))

  /** Token-set cluster frame, memoized per (session, sfDir). The cluster
    * table feeds 5 branches (members, sizes, bands, both join sides) and is
    * tiny (≪ docs) — cache it instead of recomputing the groupBy+hash per
    * branch (the reference's temp-table analog, sql_to_line.py:161-202).
    * Memoization bounds storage memory to one cached frame per dataset even
    * when the query is built repeatedly in one session.
    */
  private val clusterCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def clusterFrame(s: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate((s, dir), Tables.documents(s, dir)
      .groupBy(array_sort(dtoks).as("t"))
      .agg(collect_list(col("doc_id")).as("ms"))
      // tokens pre-hashed once per cluster, sorted: set ops become O(n)
      // merge walks on longs (PolyHash is injective on the corpus
      // vocabulary — asserted by QueriesSpec)
      .withColumn("th", array_sort(transform(col("t"), t => poly_hash(t))))
      .withColumn("sig", minhashSigsOf(col("th")))
      .withColumn("cid", array_min(col("ms")))
      .cache())

  // ---- DuckDB mirrors -----------------------------------------------------

  /** Polynomial hash of an arbitrary SQL string expression, char by char. */
  def hashSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
       |  list_transform(range(1, length($e) + 1),
       |    i -> CAST(ascii(substr($e, i, 1)) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  private val hsCte =
    s"""WITH hs_t AS (
       |  SELECT doc_id,
       |         list_transform(list_distinct(string_split(text, ' ')),
       |                        t -> ${hashSql("t")}) AS hs
       |  FROM documents
       |)""".stripMargin

  private val sigExpr =
    "list_min(list_transform(hs, h -> (h * (2 * i + 1) + (101 * i + 17)) % 1000000007))"

  /** Qualifying near-dup CLUSTER pairs (cid < cid2): band collision →
    * signature agreement → exact Jaccard. The doc-level pair set is exactly
    * the member cross-product of these plus all intra-cluster pairs, so
    * graph algorithms (connected components) can run on this tiny graph.
    */
  private[ops] def qualifyingClusterPairs(s: SparkSession, dir: String): DataFrame = {
    val clusters = clusterFrame(s, dir)
    val bandRows = clusters.select(col("cid"),
      posexplode(bandKeys(col("sig"))).as(Seq("band", "key")))
    val cand = bandRows.join(
      bandRows.select(col("cid").as("cid2"), col("band").as("band2"),
        col("key").as("key2")),
      col("band") === col("band2") && col("key") === col("key2") &&
        col("cid") < col("cid2"))
      .select("cid", "cid2").distinct()
    val left  = clusters.select(col("cid"), col("th").as("h1"), col("sig").as("sig1"))
    val right = clusters.select(col("cid").as("cid2"), col("th").as("h2"),
      col("sig").as("sig2"))
    val inter = graft.functions.exprs.intersect_count_sorted(col("h1"), col("h2"))
    val uni   = size(col("h1")) + size(col("h2")) - inter
    cand.join(left, "cid").join(right, "cid2")
      .select(col("cid"), col("cid2"),
        graft.functions.exprs.count_equal(col("sig1"), col("sig2")).as("sig_agree"),
        inter.as("inter"), uni.as("uni"), (inter / uni).as("jac"))
      .filter(col("sig_agree") >= MinSigAgree && col("jac") >= JaccardTau)
  }

  val queries: Seq[Q] = Seq(

    // Whole-document fingerprint (rolling polynomial hash over all chars).
    Q("q_doc_fingerprint",
      s"SELECT doc_id, ${hashSql("text")} AS fp FROM documents ORDER BY doc_id") {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), poly_hash(col("text")).as("fp"))
          .orderBy("doc_id")
    },

    // MinHash signatures, one row per (doc, permutation). Token hashes are
    // materialized in their own projection first — inlining them would
    // re-run PolyHash once per permutation (16× the work).
    Q("q_minhash_sigs",
      s"""$hsCte
         |SELECT doc_id, CAST(i AS INTEGER) AS i, CAST($sigExpr AS BIGINT) AS sig
         |FROM hs_t, range(0, $NumPerms) t(i)
         |ORDER BY doc_id, i""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), tokenHashes.as("hs"))
        .select(col("doc_id"), posexplode(minhashSigsOf(col("hs"))).as(Seq("i", "sig")))
        .orderBy("doc_id", "i")
    },

    // LSH near-dup pipeline: band-key candidate pairs → cheap signature-
    // agreement prefilter (est. Jaccard, 16 comparisons) → exact token-set
    // Jaccard verify. Only (band,key) rows and signatures shuffle — full
    // texts never move; at 100 TB each stage is a key-partitioned join.
    Q("q_dedup_minhash_pairs",
      s"""$hsCte, sig_t AS (
         |  SELECT doc_id, list_transform(range(0, $NumPerms), i -> $sigExpr) AS sig
         |  FROM hs_t
         |), band_t AS (
         |  SELECT doc_id, b,
         |         array_to_string(sig[(b * $BandRows + 1):(b * $BandRows + $BandRows)], ',') AS key
         |  FROM sig_t, range(0, $NumBands) t(b)
         |), cand AS (
         |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
         |  FROM band_t l JOIN band_t r ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id
         |), est AS (
         |  SELECT d1, d2,
         |         CAST(len(list_filter(list_transform(range(1, $NumPerms + 1),
         |           i -> sa.sig[i] = sb.sig[i]), x -> x)) AS INTEGER) AS sig_agree
         |  FROM cand JOIN sig_t sa ON sa.doc_id = d1 JOIN sig_t sb ON sb.doc_id = d2
         |), tk AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
         |)
         |SELECT d1, d2, sig_agree,
         |       CAST(len(list_intersect(a.t, b.t)) AS INTEGER) AS inter,
         |       CAST(len(list_distinct(list_concat(a.t, b.t))) AS INTEGER) AS uni,
         |       (len(list_intersect(a.t, b.t)) / len(list_distinct(list_concat(a.t, b.t)))) AS jac
         |FROM est JOIN tk a ON a.doc_id = d1 JOIN tk b ON b.doc_id = d2
         |WHERE sig_agree >= $MinSigAgree
         |  AND (len(list_intersect(a.t, b.t)) / len(list_distinct(list_concat(a.t, b.t)))) >= $JaccardTau
         |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      // MinHash signatures and Jaccard depend only on the distinct-token
      // SET, so first collapse docs into token-set equivalence clusters.
      // On a heavily-duplicated corpus the qualifying-pair output is
      // Θ(cluster²) — unavoidable — but this layout does ALL similarity
      // work (signatures, band collisions, agreement, exact Jaccard) once
      // per cluster PAIR; per doc pair only codegen'd enumeration remains.
      // At 100 TB: clusters ≪ docs shuffle by token-set hash, cluster-pair
      // join is broadcast-sized, and the final explode is embarrassingly
      // parallel.
      val clusters = clusterFrame(s, dir)

      // member table: one slim (cid, doc) row per doc — pair fan-out happens
      // INSIDE joins on cid, so wide arrays never ride along with pair rows
      val memAll = clusters.select(col("cid"), explode(col("ms")).as("d"))

      // intra-cluster: identical token sets → sig_agree = 16, jac = 1.0
      val nPer = clusters.select(col("cid"), size(col("t")).as("n"))
      val intra = memAll
        .join(memAll.select(col("cid"), col("d").as("d2")), "cid")
        .filter(col("d") < col("d2"))
        .join(broadcast(nPer), "cid")
        .select(col("d").as("d1"), col("d2"), lit(NumPerms).as("sig_agree"),
          col("n").as("inter"), col("n").as("uni"), (col("n") / col("n")).as("jac"))

      // inter-cluster: judged once per CLUSTER pair
      // (qualifyingClusterPairs), then fanned out to member pairs via joins
      val interPairs = qualifyingClusterPairs(s, dir)
        .join(memAll.select(col("cid"), col("d").as("da")), "cid")
        .join(memAll.select(col("cid").as("cid2"), col("d").as("db")), "cid2")
        .select(least(col("da"), col("db")).as("d1"),
          greatest(col("da"), col("db")).as("d2"),
          col("sig_agree"), col("inter"), col("uni"), col("jac"))

      intra.union(interPairs).orderBy("d1", "d2")
    },

    // Exact n-gram (word 1-gram set) Jaccard over consecutive-id pairs —
    // the deterministic all-checked slice of pairwise similarity.
    Q("q_jaccard_pairs",
      """WITH tk AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |       CAST(len(list_intersect(a.t, b.t)) AS INTEGER) AS inter,
        |       CAST(len(list_distinct(list_concat(a.t, b.t))) AS INTEGER) AS uni,
        |       (len(list_intersect(a.t, b.t)) / len(list_distinct(list_concat(a.t, b.t)))) AS jac
        |FROM tk a JOIN tk b ON b.doc_id = a.doc_id + 1
        |ORDER BY d1""".stripMargin) { (s, dir) =>
      val tk = Tables.documents(s, dir).select(col("doc_id"), dtoks.as("t"))
      val a  = tk.select(col("doc_id").as("d1"), col("t").as("t1"))
      val b  = tk.select(col("doc_id").as("d2"), col("t").as("t2"))
      val inter = size(array_intersect(col("t1"), col("t2")))
      val uni   = size(array_union(col("t1"), col("t2")))
      a.join(b, col("d2") === col("d1") + 1)
        .select(col("d1"), col("d2"), inter.as("inter"), uni.as("uni"),
          (inter / uni).as("jac"))
        .orderBy("d1")
    },

    // 30-bit SimHash (occurrence-weighted) + Hamming distance to the next
    // doc id — near-dup detection by small Hamming distance.
    Q("q_simhash",
      s"""WITH hs_t AS (
         |  SELECT doc_id,
         |         list_transform(string_split(text, ' '), t -> ${hashSql("t")}) AS hs
         |  FROM documents
         |), sg AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 30), j ->
         |    CASE WHEN list_sum(list_transform(hs, h ->
         |           CASE WHEN ((h >> j) & 1) = 1 THEN CAST(1 AS BIGINT)
         |                ELSE CAST(-1 AS BIGINT) END)) > 0
         |         THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
         |  FROM hs_t
         |)
         |SELECT doc_id, sig,
         |       CAST(bit_count(xor(sig, lead(sig) OVER (ORDER BY doc_id))) AS INTEGER) AS ham_next
         |FROM sg ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sig = sim_hash30(transform(toks, t => poly_hash(t)))
      val w   = Window.orderBy("doc_id")
      Tables.documents(s, dir)
        .select(col("doc_id"), sig.as("sig"))
        .withColumn("ham_next", bit_count(col("sig").bitwiseXOR(lead(col("sig"), 1).over(w))))
        .orderBy("doc_id")
    }
  )
}
