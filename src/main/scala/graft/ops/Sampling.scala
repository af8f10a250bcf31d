package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deterministic sampling / dataset-split operators for a training-data
  * pipeline. Everything is keyed on a pure-integer hash of `doc_id`, so:
  *
  *  - membership is REPRODUCIBLE: re-running over the same corpus (or a
  *    grown corpus) keeps every previously-assigned document in the same
  *    split — the property that keeps eval sets uncontaminated as a 100 TB
  *    corpus is re-ingested (a `rand()` sample would reshuffle membership
  *    every run and leak test docs into training);
  *  - the operator is a NARROW per-row filter — no shuffle, no sort, no
  *    state; it composes with scans at full input parallelism and the
  *    predicate is Catalyst-visible (constant-folds into the scan stage);
  *  - the same arithmetic runs in any engine (the DuckDB oracle executes
  *    the identical formula), so split assignments can be validated
  *    cross-system — how a real migration would prove parity.
  *
  * Hash: doc_id is split at bit 31 into low/high parts, each mixed by an
  * LCG-style multiplier, mod M = 2^31-1. All intermediate products stay
  * below 2^62 for ANY non-negative int64 id, so the arithmetic never
  * overflows in either engine (DuckDB errors on bigint overflow; Spark wraps silently —
  * the overflow-safe form is the only one that is cross-engine exact;
  * reference analog: the reference's deterministic per-day batching,
  * sql_to_line.py:113-131, is this same idea keyed on date instead of id).
  */
object Sampling {

  final val M  = 2147483647L // 2^31 - 1 (Mersenne prime)
  final val A  = 1103515245L // glibc LCG multiplier
  final val B  = 48271L      // MINSTD multiplier
  final val C  = 12345L

  final val H = 2147483648L // 2^31: power-of-two half-split (lo = low 31 bits)

  /** Overflow-safe deterministic bucket in [0, 100) from an int64 id. */
  def bucket100(id: Column): Column = {
    val lo = pmod(id, lit(H))
    val hi = shiftright(id, 31)
    pmod(lo * lit(A) + hi * lit(B) + lit(C), lit(M)) % lit(100L)
  }

  /** The identical formula in DuckDB SQL (BIGINT-exact; `//` by 2^31
    * equals Spark's `shiftright(id, 31)` for non-negative ids).
    */
  def bucket100Sql(id: String): String =
    s"((($id % $H) * $A + ($id // $H) * $B + $C) % $M) % 100"

  private[graft] def split(b: Column): Column =
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")

  private[graft] def splitSql(b: String): String =
    s"(CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'valid' ELSE 'test' END)"

  val queries: Seq[Q] = Seq(

    // Per-document deterministic sample membership: the full assignment
    // frame (hash bucket + 10%-sample flag), cell-exact cross-engine.
    Q("q_sample_hash",
      s"""SELECT doc_id,
         |       CAST(${bucket100Sql("doc_id")} AS BIGINT) AS bucket,
         |       (${bucket100Sql("doc_id")} < 10) AS in_sample
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val b = bucket100(col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), b.as("bucket"), (b < 10).as("in_sample"))
        .orderBy("doc_id")
    },

    // 80/10/10 train/valid/test split: per-split corpus statistics prove
    // the fractions land and the split is language-balanced (hash buckets
    // are independent of content). The split column itself is the same
    // narrow expression — downstream writers partition on it.
    // Split-leakage audit — the QA gate a train/valid/test split must
    // pass before training: documents sharing an OPENING (equal PolyHash
    // fingerprints of the first 8 tokens — the conservative containment
    // proxy; exact-duplicate leakage is its subset, and this corpus
    // carries shared-opening near-dup families but zero exact dups) must
    // not straddle split boundaries, or eval is contaminated by
    // near-memorized training text. One (fingerprint, split) distinct
    // frame, fingerprint-keyed self-join bounded by ≤3 splits per
    // fingerprint — candidate work is Θ(families), never docs².
    Q("q_split_leakage",
      s"""WITH fs AS (
         |  SELECT DISTINCT
         |    ${Dedup.hashSql("array_to_string(string_split(text, ' ')[1:8], ' ')")} AS fp,
         |    ${splitSql(bucket100Sql("doc_id"))} AS split
         |  FROM documents),
         |p AS (
         |  SELECT a.split AS s1, b.split AS s2, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM fs a JOIN fs b ON a.fp = b.fp AND a.split < b.split
         |  GROUP BY 1, 2)
         |SELECT s1, s2, n_shared FROM p
         |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
      import graft.functions.exprs.poly_hash
      val fs = Tables.documents(s, dir)
        .select(poly_hash(array_join(
            slice(org.apache.spark.sql.functions.split(col("text"), " "), 1, 8), " "))
            .as("fp"),
          split(bucket100(col("doc_id"))).as("split"))
        .distinct()
      fs.as("a").join(fs.as("b"),
          col("a.fp") === col("b.fp") && col("a.split") < col("b.split"))
        .groupBy(col("a.split").as("s1"), col("b.split").as("s2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("s1", "s2")
    },

    Q("q_split_train_test",
      s"""WITH s AS (
         |  SELECT ${splitSql(bucket100Sql("doc_id"))} AS split, n_chars, lang
         |  FROM documents
         |)
         |SELECT split, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       count(DISTINCT lang) AS n_langs
         |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(split(bucket100(col("doc_id"))).as("split"), col("n_chars"), col("lang"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("split")
    },

    // Weighted source mixing — the training-mix operator: each source gets
    // its own keep-rate (here derived deterministically from the source
    // name's numeric suffix; in production a config map), applied through
    // the SAME per-doc hash gate, so (a) mixture weights are exact in
    // expectation, (b) membership is reproducible doc-by-doc, (c) a doc's
    // fate never depends on other docs — the filter stays a narrow
    // expression at any corpus size. Zero-rate sources prove exclusion.
    Q("q_source_mix",
      s"""WITH d AS (
         |  SELECT source,
         |         ((CAST(substr(source, 4) AS BIGINT) * 5) % 100) AS rate,
         |         ${bucket100Sql("doc_id")} AS b
         |  FROM documents
         |)
         |SELECT source, CAST(max(rate) AS BIGINT) AS rate_pct,
         |       count(*) AS n_total,
         |       CAST(sum(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val rate = (substring(col("source"), 4, 10).cast("long") * 5) % 100
      Tables.documents(s, dir)
        .select(col("source"), rate.as("rate"), bucket100(col("doc_id")).as("b"))
        .groupBy("source")
        .agg(max("rate").as("rate_pct"), count(lit(1)).as("n_total"),
          sum(when(col("b") < col("rate"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("source")
    },

    // Stratified deterministic sample: the SAME 10% hash gate applied
    // within each language stratum — per-stratum sampled/total counts.
    // Because the hash is content-independent, each stratum's sampled
    // fraction concentrates around 10% without a per-stratum pass
    // (single aggregation; no shuffle beyond it).
    Q("q_stratified_sample",
      s"""SELECT lang,
         |       count(*) AS n_total,
         |       CAST(sum(CASE WHEN ${bucket100Sql("doc_id")} < 10
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(bucket100(col("doc_id")) < 10, 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("lang")
    },

    // Deterministic weighted sampling without replacement — priority
    // sampling (Duffield, Lund & Thorup, JACM 2007, public): each doc gets
    // priority w/u with u ~ Uniform(0,1], and the global top-k by priority
    // is a weight-proportional sample. u comes from the same overflow-safe
    // hash ((h+1)/M ∈ (0,1]), so membership is reproducible and
    // cross-engine exact; the priority w·M/(h+1) is one double division
    // of exact integers → bit-identical. Top-k plans as
    // TakeOrderedAndProject: per-partition heaps, no global sort, no
    // shuffle of the corpus — the same O(parts·k) driver shape as
    // q_topk_orders, at any scale.
    Q("q_weighted_sample",
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |         (((doc_id % $H) * $A + (doc_id // $H) * $B + $C) % $M) + 1 AS h1
         |  FROM documents
         |)
         |SELECT doc_id, n_chars,
         |       CAST(n_chars AS DOUBLE) * CAST($M AS DOUBLE)
         |         / CAST(h1 AS DOUBLE) AS priority
         |FROM d ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      val lo = pmod(col("doc_id"), lit(H))
      val hi = shiftright(col("doc_id"), 31)
      val h1 = pmod(lo * lit(A) + hi * lit(B) + lit(C), lit(M)) + lit(1L)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (col("n_chars").cast("double") * lit(M.toDouble) /
            h1.cast("double")).as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(100)
    },

    // Stratified priority sampling: the same hash-seeded weight-
    // proportional priorities, but top-20 WITHIN each language stratum —
    // the per-source quota shape a training mix actually draws with.
    // Per-stratum rank is a partitioned window (parallelism = strata);
    // same reproducibility and cross-engine exactness as the global form.
    Q("q_weighted_sample_stratified",
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars,
         |         CAST(n_chars AS DOUBLE) * CAST($M AS DOUBLE)
         |           / CAST((((doc_id % $H) * $A + (doc_id // $H) * $B + $C) % $M) + 1
         |                  AS DOUBLE) AS priority
         |  FROM documents)
         |SELECT doc_id, lang, n_chars, priority FROM (
         |  SELECT d.*, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY priority DESC, doc_id) AS INTEGER) AS rn
         |  FROM d)
         |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      val lo = pmod(col("doc_id"), lit(H))
      val hi = shiftright(col("doc_id"), 31)
      val h1 = pmod(lo * lit(A) + hi * lit(B) + lit(C), lit(M)) + lit(1L)
      val pr = col("n_chars").cast("double") * lit(M.toDouble) / h1.cast("double")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("priority").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), pr.as("priority"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("doc_id", "lang", "n_chars", "priority")
        .orderBy("lang", "doc_id")
    }
  )
}
