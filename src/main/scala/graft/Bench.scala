package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    // warmup: JIT/codegen/parquet-footer caches, so the first timed query
    // isn't charged ~5 s of session spin-up
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // declaration order (SparkEntry.all), not Map hash order: shared
    // first-compute (cluster frame, qualifying pairs, CC components) then
    // lands deterministically on the query that declares it, and the
    // downstream consumers measure their own marginal cost
    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      val rows = try Metrics.observe(spark, q.name)(q.build(spark, sfDir).count())
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); -1L
      }
      // failures are reported as -1 so a broken query can never read as fast
      val secs = if (rows >= 0) (System.nanoTime() - t0) / 1e9 else -1.0
      (q.name, secs, rows)
    }
    def jmap(f: ((String, Double, Long)) => String): String =
      results.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // flush the async listener bus so the metric snapshot is complete
    org.apache.spark.GraftSparkBridge.waitListenerBus(spark.sparkContext, 10000)
    val stats = listener.snapshot
    def stat(name: String, f: QueryStats => Long): Long =
      stats.get(name).map(f).getOrElse(0L)
    val qs      = jmap(r => r._2.toString)
    val rowsJ   = jmap(r => r._3.toString)
    val shufJ   = jmap(r => (stat(r._1, _.shuffleWriteBytes.sum)
                           + stat(r._1, _.shuffleReadBytes.sum)).toString)
    val spillJ  = jmap(r => (stat(r._1, _.memorySpilled.sum)
                           + stat(r._1, _.diskSpilled.sum)).toString)
    val peakJ   = jmap(r => stat(r._1, _.peakExecutionMemory).toString)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rowsJ,"shuffle_bytes":$shufJ,"spilled_bytes":$spillJ,"peak_exec_mem":$peakJ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
