package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: `runMain graft.Explain <query> [sfDir] [mode]`
  * prints the formatted physical plan and a timed count — the feedback
  * loop for shuffle/pushdown/codegen auditing (SURVEY §4).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode  = if (args.length > 2) args(2) else "formatted"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain(mode)
    var t0 = System.nanoTime()
    val n  = df.count()
    println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s (cold)")
    t0 = System.nanoTime()
    df.count()
    println(f"[explain] $name: warm ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
