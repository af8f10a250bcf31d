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

    timed("warmup (unrelated query)")(
      ops.Relational.queries.head.build(spark, sfDir).count())
    timed("q_tfidf_cosine_pairs r1")(
      SparkEntry.queries("q_tfidf_cosine_pairs")(spark, sfDir).count())
    timed("q_tfidf_cosine_pairs r2")(
      SparkEntry.queries("q_tfidf_cosine_pairs")(spark, sfDir).count())
    timed("q_tfidf_cosine_pairs r3")(
      SparkEntry.queries("q_tfidf_cosine_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
