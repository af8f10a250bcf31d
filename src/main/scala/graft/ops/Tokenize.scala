package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * corpus-side half of what SentencePiece/HF tokenizers do on one machine
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"). A 100 TB tokenizer build is exactly this decomposition:
  *
  *  1. ONE corpus shuffle: word → frequency (the only pass that touches
  *     every token; Heaps' law makes the distinct-word frame orders of
  *     magnitude smaller than the corpus).
  *  2. Every merge iteration runs on the VOCAB frame only: weighted
  *     adjacent-symbol-pair counts (a vocab-sized aggregate), a
  *     deterministic argmax via orderBy+limit(1) (plans as
  *     TakeOrderedAndProject — one row to the driver per round, the same
  *     bounded-model-state class as the k-means centroids), and a narrow
  *     per-row merge application. Iteration cost is independent of corpus
  *     size; the merge table held on the driver is O(nMerges).
  *
  * Merge application is the standard greedy left-to-right non-overlapping
  * replace, expressed as a catalyst `aggregate` fold over the symbol array
  * (no UDF). Lineage from repeated column rewrites is truncated with a
  * localCheckpoint every [[CheckpointEvery]] rounds so deep merge counts
  * don't accumulate a nested-plan tower.
  *
  * Verification: `q_bpe_pairs` (iteration-0 weighted pair counts) is
  * cell-exact against DuckDB; the iterative trainer is validated in
  * TokenizeSpec against a from-scratch sequential BPE implementation
  * (exact merge-list equality), the same oracle split as connected
  * components (SQL can't express a data-dependent loop).
  */
object Tokenize {

  /** Merge rounds for the declared vocab query. */
  final val NMerges = 16

  /** Pair-count rows surfaced by the oracle-checked query. */
  final val TopPairs = 32

  final val CheckpointEvery = 8

  /** (word, freq) — the single corpus-wide shuffle. */
  def wordFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Weighted adjacent-pair counts over a (freq, syms) vocab frame.
    * Single-symbol words contribute nothing (filtered before the
    * transform: `sequence(1, 0)` would run DOWNWARD in Spark).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
        "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("n"))

  /** Greedy left-to-right application of one merge (l, r) → l+r to a
    * symbol array, as a fold: append each symbol unless it completes the
    * pair with the accumulator's tail, in which case the tail is replaced
    * by the merged symbol. `try_element_at` (not `element_at`) keeps the
    * empty-accumulator probe null-safe under ANSI mode. Matches the
    * non-overlapping replace of reference BPE implementations ("aaa" with
    * merge (a,a) → [aa, a]).
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train nMerges BPE merges; returns the ordered merge list. Ties on
    * pair count break lexicographically — deterministic across runs and
    * engines.
    */
  def train(s: SparkSession, dir: String, nMerges: Int): Seq[(String, String)] = {
    var vocab = wordFreq(s, dir)
      .select(col("freq"), split(col("word"), "").as("syms"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < nMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) round = nMerges
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        vocab = vocab.withColumn("syms", applyMerge(col("syms"), l, r))
        round += 1
        if (round % CheckpointEvery == 0) vocab = vocab.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Encode one symbol array through an ordered merge list (column form —
    * used by the vocab query and the spec's encode equivalence test).
    */
  def encodeCol(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (l, r)) => applyMerge(c, l, r) }

  val queries: Seq[Q] = Seq(

    // Iteration-0 weighted pair counts — the exact aggregate every merge
    // round runs, cell-checked. pair = l || r is unambiguous at iteration
    // 0 (all symbols are single characters).
    Q("q_bpe_pairs",
      s"""WITH w AS (
         |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |s AS (SELECT freq, string_split(word, '') AS cs FROM w),
         |p AS (
         |  SELECT freq, unnest([cs[i] || cs[i+1] for i in range(1, len(cs))]) AS pair
         |  FROM s WHERE len(cs) >= 2)
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
         |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT $TopPairs""".stripMargin) {
      (s, dir) =>
        wordFreq(s, dir)
          .select(col("freq"), split(col("word"), "").as("syms"))
          .transform(pairCounts)
          .select(concat(col("l"), col("r")).as("pair"), col("n"))
          .orderBy(col("n").desc, col("pair")).limit(TopPairs)
    },

    // Trained merge table + resulting subword vocabulary: rows-only by
    // design (data-dependent loop; TokenizeSpec proves merge-list equality
    // with a sequential reference implementation).
    Q.noOracle("q_bpe_vocab") { (s, dir) =>
      val merges = train(s, dir, NMerges)
      wordFreq(s, dir)
        .select(col("freq"),
          encodeCol(split(col("word"), ""), merges).as("syms"))
        .select(explode(col("syms")).as("subword"), col("freq"))
        .groupBy("subword").agg(sum("freq").as("n_tokens"))
        .orderBy(col("n_tokens").desc, col("subword"))
    },

    // Corpus-wide tokenizer application: per-document BPE token counts.
    // The trained encoder applies to the DISTINCT-WORD frame once
    // (vocab-sized); the corpus then just joins word → subword count — the
    // narrow layout that tokenizes 100 TB without running the merge fold
    // per occurrence. Rows-only (training loop); TokenizeSpec recounts
    // documents against the sequential reference encoder.
    Q.noOracle("q_bpe_token_count") { (s, dir) =>
      val merges = train(s, dir, NMerges)
      val wordLen = wordFreq(s, dir)
        .select(col("word"),
          size(encodeCol(split(col("word"), ""), merges)).as("n_sub"))
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .join(wordLen, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens"))
        .orderBy("doc_id")
    }
  )
}
