package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for driver testdata (TESTDATA.md).
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet per table under the sf dir.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * Read it as raw nanos and truncate to microseconds with exact integer
    * division (`div`) — the same ns→µs truncation DuckDB's parquet reader
    * applies, so the engines see identical instants. (Double division would
    * lose precision: epoch-nanos ≈ 1.7e18 > 2^53.)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
