package graft

import org.apache.spark.sql.functions._

/** PageRank validated against a hand-computed reference on a known graph,
  * plus conservation/positivity invariants on the near-dup graph query.
  */
class GraphSpec extends SparkSpec {

  /** Path + triangle: 1-2, 2-3 (path) and 10-11, 11-12, 10-12 (triangle). */
  private def fixturePairs = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("d1", "d2")
  }

  /** The same integer-micro recurrence, sequentially. */
  private def seqPageRank(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var pr: Map[Long, Long] = deg.map { case (v, _) =>
      v -> math.round(1000000.0 / n)
    }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / deg(u) }.sum).toMap
      pr = deg.map { case (v, _) =>
        v -> math.round(150000.0 / n + 0.85 * in.getOrElse(v, 0L))
      }
    }
    pr
  }

  test("distributed PageRank equals the sequential recurrence on a known graph") {
    val got = ops.Graph.pageRank(fixturePairs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = seqPageRank(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L)),
      ops.Graph.PrIters)
    assert(got === want)
    // structure: triangle nodes are symmetric, path center outranks ends
    assert(got(10L) === got(11L) && got(11L) === got(12L))
    assert(got(2L) > got(1L) && got(1L) === got(3L))
  }

  test("near-dup PageRank: positive ranks, mass ≈ 1, degrees match the pair graph") {
    val out = SparkEntry.all.find(_.name == "q_pagerank_neardup").get
      .build(spark, sfDir).cache()
    assert(out.filter(col("pr_micro") <= 0).count() === 0)
    val n = out.count()
    val mass = out.agg(sum("pr_micro")).head.getLong(0)
    // floor division loses up to (deg-1) micro per node per round (the
    // price of the integer-exact cross-engine trajectory), plus one
    // rounding per node; mass can only drift DOWN by that much
    val sumDeg = out.agg(sum("deg")).head.getLong(0)
    val slack = ops.Graph.PrIters * (sumDeg + n)
    assert(mass <= 1000000L + ops.Graph.PrIters * n &&
      mass >= 1000000L - slack,
      s"mass $mass outside [1e6 - $slack, 1e6 + ${ops.Graph.PrIters * n}]")
    // round 7: the declared query runs the FULL near-dup graph (the
    // temp-table oracle script removed the old doc_id % 4 cost
    // restriction), so degrees must match the full pair graph
    val p = ops.Dedup.minhashPairs(spark, sfDir)
    val deg = p.select(col("d1").as("doc_id"))
      .union(p.select(col("d2").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("want"))
    assert(out.join(deg, "doc_id").filter(col("deg") =!= col("want")).count() === 0)
  }
}
