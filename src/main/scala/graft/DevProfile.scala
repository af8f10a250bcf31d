package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage-level profiler for whatever pipeline is under the knife
  * (dev tool — targets change round to round).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)"); r
    }

    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q_tfidf_cosine_pairs", "q_minhash_calibration")
    timed("warmup (unrelated query)")(
      ops.Relational.queries.head.build(spark, sfDir).count())
    for (n <- names; rep <- 1 to 2)
      timed(s"$n r$rep")(SparkEntry.queries(n)(spark, sfDir).count())
    spark.stop()
  }
}
