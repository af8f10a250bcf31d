package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage-level profiler for the dedup/corpus pipeline (dev tool). */
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

    // cold corpus path exactly as the bench sees it when q_training_corpus
    // runs first: one warmup query, then the full composed pipeline
    timed("warmup (unrelated query)")(
      ops.Relational.queries.head.build(spark, sfDir).count())
    timed("q_training_corpus COLD")(
      SparkEntry.queries("q_training_corpus")(spark, sfDir).count())
    timed("q_dedup_components (memoized)")(
      SparkEntry.queries("q_dedup_components")(spark, sfDir).count())
    timed("q_dedup_minhash_pairs (marginal)")(
      SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir).count())
    timed("q_simhash")(SparkEntry.queries("q_simhash")(spark, sfDir).count())
    val emb = Tables.embeddings(spark, sfDir)
    timed("pq codebooks only")(ops.Similarity.pqCodebooks(emb).length)
    timed("q_pq_topk full")(
      SparkEntry.queries("q_pq_topk")(spark, sfDir).count())
    timed("q_pq_topk again")(
      SparkEntry.queries("q_pq_topk")(spark, sfDir).count())
    spark.stop()
  }
}
