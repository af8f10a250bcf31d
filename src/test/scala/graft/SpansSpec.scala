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

  test("ngram novelty: bounds, first-doc totality, lowest doc fully novel") {
    val nov = SparkEntry.queries("q_ngram_novelty")(spark, sfDir).cache()
    assert(nov.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0)
    assert(nov.filter(col("n_novel") > col("n_windows")).count() === 0)
    // the lowest doc_id has no earlier documents — everything it says is novel
    val first = nov.orderBy("doc_id").limit(1).head
    assert(first.getLong(2) === first.getLong(1), "first doc must be 100% novel")
    // every distinct window is novel somewhere: summing per-doc novel
    // counts must cover at least the distinct window-content count
    val wins = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= SpanLen)
      .select(explode(expr(
        s"transform(sequence(1, size(toks) - $SpanLen + 1), " +
        s"i -> concat_ws(' ', slice(toks, i, $SpanLen)))")).as("win"))
    val distinctWins = wins.select("win").distinct().count()
    val novelSum = nov.agg(sum("n_novel")).head.getLong(0)
    assert(novelSum >= distinctWins)
  }
}
