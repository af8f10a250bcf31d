package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning: with ~15 distinct user_ids, an events⋈events
  * join is pathologically skewed. Under production-shaped thresholds AQE's
  * OptimizeSkewedJoin must split the hot partitions at runtime — the
  * "skew=true" marker in the final adaptive plan is the observable proof
  * (SURVEY §4.2's runtime skew-join claim, exercised not asserted).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits skewed join partitions at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold"                         -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                          -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"            -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"  -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"              -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled"                -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // manufacture a hot key: user 1 gets 6× every other user's rows
      val base = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("value"))
      val hot = (1 to 5).map(i => base.withColumn("user_id", lit(1L))
        .withColumn("event_id", col("event_id") + lit(i * 1000000L)))
        .reduce(_.union(_))
      val a = base.union(hot)
      val b = Tables.events(spark, sfDir).limit(200)
        .select(col("user_id").as("uid2"), col("event_id").as("eid2"))
      val j = a.join(b, col("user_id") === col("uid2"))
      // execute THIS dataset's own QueryExecution so its adaptive plan
      // finalizes (count() would plan a different query)
      assert(j.collect().length > 0)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partitions:\n${finalPlan.take(2500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
