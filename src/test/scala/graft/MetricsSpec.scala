package graft

import org.apache.spark.sql.functions._

/** The observability listener (R23) attributes task metrics to the query
  * named by the job-local property — the per-batch-log analog.
  */
class MetricsSpec extends SparkSpec {

  test("listener attributes shuffle bytes and input records to the observed query") {
    val l = new QueryMetricsListener
    spark.sparkContext.addSparkListener(l)
    try {
      Metrics.observe(spark, "probe_agg") {
        Tables.orders(spark, sfDir).groupBy("o_orderstatus")
          .agg(count(lit(1))).collect()
      }
      Tables.orders(spark, sfDir).count() // unobserved: must NOT be attributed
      org.apache.spark.GraftSparkBridge.waitListenerBus(spark.sparkContext, 10000)
      val s = l.snapshot("probe_agg")
      assert(s.tasks.sum > 0, "no tasks attributed")
      assert(s.inputRecords.sum > 0, "no input records attributed")
      assert(s.shuffleWriteBytes.sum > 0, "groupBy must write shuffle bytes")
      assert(s.shuffleReadBytes.sum > 0, "groupBy must read shuffle bytes")
      assert(l.snapshot.keySet === Set("probe_agg"),
        "unobserved job leaked into the metrics")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("two observed queries accumulate independently") {
    val l = new QueryMetricsListener
    spark.sparkContext.addSparkListener(l)
    try {
      Metrics.observe(spark, "m_scan")(
        Tables.region(spark, sfDir).collect())
      Metrics.observe(spark, "m_join") {
        val n = Tables.nation(spark, sfDir)
        n.join(Tables.region(spark, sfDir), n("n_regionkey") === col("r_regionkey"))
          .collect()
      }
      org.apache.spark.GraftSparkBridge.waitListenerBus(spark.sparkContext, 10000)
      assert(l.snapshot.keySet === Set("m_scan", "m_join"))
      assert(l.snapshot("m_scan").inputRecords.sum > 0)
      assert(l.snapshot("m_join").inputRecords.sum > 0)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
