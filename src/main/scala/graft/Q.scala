package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark builder plus (optionally) equivalent
  * ANSI SQL the driver runs in DuckDB 1.0 over the same parquet tables
  * (SURVEY.md §2.3). `oracle = None` → driver records a rows-only check.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def apply(name: String, sql: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(sql))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
