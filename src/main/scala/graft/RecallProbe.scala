package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure ANN recall@10 and candidate fraction for LSH parameter
  * combinations against the exact top-k, at a given sf dir.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exact = ops.Similarity.cosineTopK(spark, sfDir)
      .select("p_id", "c_id").cache()
    val truth = exact.count()
    val nVec = Tables.embeddings(spark, sfDir).count()
    val nProbes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0).count()
    val allPairs = nProbes.toDouble * (nVec - 1)
    println(s"[recall] vecs=$nVec probes=$nProbes truthRows=$truth")

    val combos = Seq(
      (4, 6, 4), (6, 6, 4), (6, 7, 4), (8, 7, 4), (8, 8, 4), (8, 8, 6),
      (10, 8, 4), (6, 6, 6), (6, 8, 6), (12, 8, 4))
    for ((t, p, mb) <- combos) {
      val t0 = System.nanoTime()
      val scored = ops.Similarity.lshScored(spark, sfDir, t, p, mb).cache()
      val candFrac = scored.count() / allPairs
      val hit = exact.join(scored.select("p_id", "c_id"), Seq("p_id", "c_id")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[recall] tables=$t planes=$p probeBits=$mb recall=${hit.toDouble / truth}%.3f candFrac=$candFrac%.3f time=$secs%.1f s")
      scored.unpersist()
    }
    spark.stop()
  }
}
