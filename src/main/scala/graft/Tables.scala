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

  /** `events.ts` has shipped as two parquet layouts across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects unless
    * read as raw longs) and plain TIMESTAMP(MICROS) (isAdjustedToUTC=false
    * → TIMESTAMP_NTZ under Spark's NTZ inference). Normalize BOTH to
    * session-zone TimestampType at identical instants so every downstream
    * query and oracle (`epoch_us` comparison, session tz pinned to UTC)
    * sees one stable type:
    *  - nanos-as-long → truncate to µs with exact integer division
    *    (`div`) — the same ns→µs truncation DuckDB's parquet reader
    *    applies (double division would lose precision: epoch-nanos
    *    ≈ 1.7e18 > 2^53);
    *  - TIMESTAMP_NTZ → cast to TimestampType (UTC session zone ⇒ the
    *    epoch value is unchanged, matching DuckDB's naive read).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, sfDir, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** Spread a NARROW scan across the cluster before expensive per-row
    * work (guide §2.5: an unsplittable input file serializes the whole
    * scan stage — "repartition immediately after the read"). The shipped
    * testdata is one single-row-group parquet file per table, so every
    * scan-stage computation (tokenize+hash pipelines, codec round-trips,
    * n-gram explodes and their map-side partial aggregations) otherwise
    * runs on ONE task regardless of cores. Scale-adaptive, not a local
    * constant: the repartition fires only when the file layout yields
    * fewer scan splits than the cluster's default parallelism — a
    * production multi-row-group / multi-file table already scans wide and
    * passes through untouched — and the shuffle it adds moves only the
    * narrow pre-fan-out rows. Apply at the HEAD of measured-heavy per-row
    * pipelines, not blanket: a sub-second scan→aggregate query would pay
    * the extra exchange for nothing.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val hconf = spark.sparkContext.hadoopConfiguration
    val splits = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val len = p.getFileSystem(hconf).getFileStatus(p).getLen
      math.max(1L, (len + maxSplit - 1) / maxSplit)
    }.sum
    val target = spark.sparkContext.defaultParallelism
    if (splits < target) df.repartition(target) else df
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
