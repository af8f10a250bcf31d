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
  private def minhashSigs: Column =
    transform(sequence(lit(0), lit(NumPerms - 1)), i =>
      array_min(transform(tokenHashes, h =>
        (h * (i * 2 + 1) + (i * 101 + 17)) % Hashing.Mod)))

  /** (doc_id, band, key) rows: key = comma-joined band slice of the sig. */
  private def bands(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(NumBands - 1)), b =>
        concat_ws(",", transform(slice(minhashSigs, b * BandRows + 1, lit(BandRows)),
          x => x.cast("string"))))).as(Seq("band", "key")))

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

  val queries: Seq[Q] = Seq(

    // Whole-document fingerprint (rolling polynomial hash over all chars).
    Q("q_doc_fingerprint",
      s"SELECT doc_id, ${hashSql("text")} AS fp FROM documents ORDER BY doc_id") {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), poly_hash(col("text")).as("fp"))
          .orderBy("doc_id")
    },

    // MinHash signatures, one row per (doc, permutation).
    Q("q_minhash_sigs",
      s"""$hsCte
         |SELECT doc_id, CAST(i AS INTEGER) AS i, CAST($sigExpr AS BIGINT) AS sig
         |FROM hs_t, range(0, $NumPerms) t(i)
         |ORDER BY doc_id, i""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(minhashSigs).as(Seq("i", "sig")))
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
      val docs = Tables.documents(s, dir)
      val sigs = docs.select(col("doc_id"), minhashSigs.as("sig"))
      val b1   = bands(docs)
      val b2   = b1.select(col("doc_id").as("doc_id2"), col("band").as("band2"),
        col("key").as("key2"))
      val cand = b1.join(b2,
        col("band") === col("band2") && col("key") === col("key2") &&
          col("doc_id") < col("doc_id2"))
        .select(col("doc_id").as("d1"), col("doc_id2").as("d2")).distinct()
      val sigAgree = size(filter(
        zip_with(col("sig1"), col("sig2"), (a, b) => a === b), x => x))
      val est = cand
        .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
        .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
        .select(col("d1"), col("d2"), sigAgree.as("sig_agree"))
        .filter(col("sig_agree") >= MinSigAgree)
      val tk   = docs.select(col("doc_id"), dtoks.as("t"))
      val inter = size(array_intersect(col("t1"), col("t2")))
      val uni   = size(array_union(col("t1"), col("t2")))
      est
        .join(tk.select(col("doc_id").as("d1"), col("t").as("t1")), "d1")
        .join(tk.select(col("doc_id").as("d2"), col("t").as("t2")), "d2")
        .select(col("d1"), col("d2"), col("sig_agree"), inter.as("inter"),
          uni.as("uni"), (inter / uni).as("jac"))
        .filter(col("jac") >= JaccardTau)
        .orderBy("d1", "d2")
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
