package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the operator modules under [[graft.ops]];
  * each declared query carries its own DuckDB oracle SQL (or None for a
  * rows-only check).
  */
object SparkEntry {
  private def modules: Seq[Seq[Q]] = Seq(
    ops.PostingLines.queries,
    ops.Relational.queries,
    ops.TextOps.queries,
    ops.Dedup.queries,
    ops.Similarity.queries,
    ops.Multimodal.queries,
    ops.Extras.queries,
    ops.Advanced.queries,
    ops.Corpus.queries,
    ops.Sampling.queries,
    ops.Shards.queries,
    ops.Spatial.queries,
    ops.Lakehouse.queries,
    ops.Curation.queries,
    ops.Retrieval.queries,
    ops.Tokenize.queries,
    ops.Spans.queries,
    ops.LM.queries,
    ops.Graph.queries,
    ops.Clustering.queries,
    ops.Sketches.queries,
    ops.Pipeline.queries,
    ops.Profile.queries
  )

  def all: Seq[Q] = modules.flatten

  /** Flagship: the full posting-lines pipeline (SURVEY §7 P0) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.PostingLines.merged(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
