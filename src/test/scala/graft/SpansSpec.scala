package graft

import org.apache.spark.sql.functions._

/** Invariants of duplicated-span detection beyond the cell-exact oracle:
  * spans are within-document, at least one window long, mutually disjoint
  * (maximality of the island coalescing), and every span's leading window
  * genuinely occurs at least twice corpus-wide.
  */
class SpansSpec extends SparkSpec {

  import ops.Spans._

  private lazy val out = SparkEntry.all.find(_.name == "q_dup_spans").get
    .build(spark, sfDir).cache()

  test("spans are in-bounds and at least SpanLen tokens") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val j = out.join(docs, "doc_id")
    assert(j.filter(col("span_start") < 1 ||
      col("span_end") > col("n_tok") ||
      col("span_end") - col("span_start") + 1 < SpanLen ||
      col("n_windows") < 1).count() === 0)
  }

  test("per-document spans are disjoint and ordered (island maximality)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val bad = out
      .withColumn("prev_end", lag("span_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("span_start") <= col("prev_end"))
    assert(bad.count() === 0)
  }

  test("each span's first window really occurs >= 2 times corpus-wide") {
    // independent recount: brute-force window multiset from raw text
    val wins = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= SpanLen)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - $SpanLen + 1), " +
        s"i -> concat_ws(' ', slice(toks, i, $SpanLen)))"))
        .as(Seq("pos0", "win")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("win"))
    val counts = wins.groupBy("win").agg(count(lit(1)).as("n"))
    val firsts = out.select(col("doc_id"), col("span_start").as("pos"))
      .join(wins, Seq("doc_id", "pos"))
      .join(counts, "win")
    assert(firsts.filter(col("n") < 2).count() === 0)
    assert(firsts.count() === out.count())
  }
}
