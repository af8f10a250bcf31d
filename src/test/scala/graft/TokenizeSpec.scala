package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Validates the distributed BPE trainer against a from-scratch sequential
  * reference implementation (the oracle split used for data-dependent
  * loops, like connected components): exact merge-list equality, encode
  * equivalence on every vocab word, and character-mass conservation of the
  * resulting subword vocabulary.
  */
class TokenizeSpec extends SparkSpec {

  import ops.Tokenize._

  /** Reference sequential BPE (Sennrich et al. 2016): count weighted
    * adjacent pairs, merge the (count desc, pair asc) argmax greedily
    * left-to-right, repeat.
    */
  private def seqApply(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def seqBpe(freqs: Map[String, Long], n: Int): Seq[(String, String)] = {
    var vocab = freqs.map { case (w, f) => w.split("").toVector -> f }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.length < n && !stop) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, f) => seqApply(syms, best) -> f }
      }
    }
    merges.toSeq
  }

  private lazy val freqs: Map[String, Long] =
    wordFreq(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("distributed trainer reproduces the sequential reference merge list") {
    assert(train(spark, sfDir, NMerges) === seqBpe(freqs, NMerges))
  }

  test("column encode equals sequential encode on every vocab word") {
    val merges = seqBpe(freqs, NMerges)
    val got = wordFreq(spark, sfDir)
      .select(col("word"), encodeCol(split(col("word"), ""), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    freqs.keys.foreach { w =>
      val want = merges.foldLeft(w.split("").toVector)(seqApply)
      assert(got(w) === want, s"encode mismatch for '$w'")
    }
  }

  test("corpus token counts bounded by words/chars and equal a sequential recount") {
    val out = SparkEntry.all.find(_.name == "q_bpe_token_count").get
      .build(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).as("n_words_doc"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars"))
    val j = out.join(docs, "doc_id")
    assert(j.filter(col("n_bpe_tokens") < col("n_words") ||
      col("n_bpe_tokens") > col("n_chars")).count() === 0)
    assert(j.filter(col("n_words") =!= col("n_words_doc")).count() === 0)
    // sequential recount on a handful of documents
    val merges = seqBpe(freqs, NMerges)
    val sample = j.select(col("doc_id"), col("text"), col("n_bpe_tokens"))
      .orderBy("doc_id").limit(5).collect()
    sample.foreach { r =>
      val want = r.getString(1).split(" ").map(w =>
        merges.foldLeft(w.split("").toVector)(seqApply).length.toLong).sum
      assert(r.getLong(2) === want, s"doc ${r.getLong(0)} token count")
    }
  }

  test("subword vocabulary conserves character mass") {
    val out = SparkEntry.all.find(_.name == "q_bpe_vocab").get
      .build(spark, sfDir)
    val subwordChars = out
      .agg(sum(expr("n_tokens * length(subword)"))).head.getLong(0)
    val corpusChars = freqs.map { case (w, f) => w.length * f }.sum
    assert(subwordChars === corpusChars)
  }
}
