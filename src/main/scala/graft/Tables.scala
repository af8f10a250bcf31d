package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for driver testdata (TESTDATA.md).
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet per table under the sf dir.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** R10 (sql_to_line.py:163-170): catalog existence check — the
    * reference probes pg_tables before creating/inserting into staging.
    */
  def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** Generic JDBC source (R1: auth_class.py:4-20 + sql_to_line.py:17-22).
    * The reference reads a live Postgres; this is the same surface through
    * Spark's JDBC source with explicit options (credentials come in via
    * `props`, e.g. user/password/driver — never baked into code). Extra
    * useful options at scale: partitionColumn/lowerBound/upperBound/
    * numPartitions for parallel reads. Offline container → untestable
    * end-to-end; the option plumbing is unit-tested (SourcesSpec).
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

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
