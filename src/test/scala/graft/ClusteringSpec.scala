package graft

import org.apache.spark.sql.functions._

/** The distributed k-means (q_kmeans_assign) against a from-scratch
  * sequential Lloyd in the same integer-micro arithmetic: identical
  * assignments prove the distributed rounds (bounded centroid collects +
  * one groupBy per round) walk the exact trajectory, independently of the
  * DuckDB oracle.
  */
class ClusteringSpec extends SparkSpec {

  private val K     = ops.Clustering.KmK
  private val Iters = ops.Clustering.KmIters

  test("distributed Lloyd equals the sequential integer-micro reference") {
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS LONG))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    val dim = vecs.head._2.length

    def dist(v: Array[Long], c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < dim) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    def assignOf(cents: Array[Array[Long]]): Array[(Long, Int, Long)] =
      vecs.map { case (id, v) =>
        var bc = 0; var bd = dist(v, cents(0))
        for (c <- 1 until K) {
          val d = dist(v, cents(c))
          if (d < bd) { bd = d; bc = c } // ties keep the lower cell
        }
        (id, bc, bd)
      }

    var cents = Array.tabulate(K)(c => vecs(c)._2.clone())
    for (_ <- 1 to Iters) {
      val asg = assignOf(cents)
      val next = Array.tabulate(K) { c =>
        val members = asg.collect { case (id, cell, _) if cell == c => id }
        if (members.isEmpty) cents(c)
        else {
          val n = members.length.toLong
          val s = new Array[Long](dim)
          members.foreach { id =>
            val v = vecs(id.toInt)._2
            var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
          }
          Array.tabulate(dim)(i => s(i) / n) // trunc-div, same as engine
        }
      }
      cents = next
    }
    val want = assignOf(cents).toSet

    val got = SparkEntry.queries("q_kmeans_assign")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want, "distributed assignment diverged from sequential Lloyd")
    // basic shape: every vector assigned exactly once, cells in range
    assert(got.size === vecs.length)
    assert(got.forall { case (_, c, d) => c >= 0 && c < K && d >= 0 })
  }
}
