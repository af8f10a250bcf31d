package graft

import org.apache.spark.sql.functions._

/** The composed end-to-end corpus build: query ≡ materialized output. */
class CorpusBuildSpec extends SparkSpec {

  test("corpus build writes split partitions that reproduce the corpus query") {
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "corpus").toString
    try testBody(out)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  private def testBody(out: String): Unit = {
    CorpusBuild.build(spark, sfDir, out)
    val back = spark.read.parquet(out)
    // split partitions exist on disk
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("split=")).map(_.getName).sorted
    assert(dirs.nonEmpty, "expected split= partition dirs")
    // materialized rows ≡ the q_training_corpus inventory
    val want = SparkEntry.queries("q_training_corpus")(spark, sfDir)
      .select("doc_id")
    assert(back.count() === want.count())
    assert(back.select("doc_id").except(want).count() === 0)
    // the split column matches the shared deterministic split expression
    val expected = ops.Sampling.split(ops.Sampling.bucket100(col("doc_id")))
    assert(back.filter(col("split") =!= expected).count() === 0)
    // a single-split read prunes partitions
    val one = spark.read.parquet(out).filter(col("split") === dirs.head.stripPrefix("split="))
    assert("PartitionFilters: \\[[^\\]]*split".r
      .findFirstIn(one.queryExecution.executedPlan.toString).isDefined,
      "split filter did not reach PartitionFilters")
  }

  test("HRW shard route writes (split, shard) partitions matching the verified argmax") {
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "corpus_hrw").toString
    try {
      val n = ops.Shards.NShards
      CorpusBuild.build(spark, sfDir, out, Some(n))
      val back = spark.read.parquet(out)
      // shard column is exactly the oracle-checked rendezvous assignment
      assert(back.filter(
        col("shard") =!= ops.Shards.hrwShard(col("doc_id"), n)).count() === 0)
      // nested shard= dirs exist under each split
      val splitDirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("split="))
      assert(splitDirs.nonEmpty)
      val shardDirs = splitDirs.head.listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName)
      assert(shardDirs.nonEmpty, "expected shard= partition dirs")
      // row inventory unchanged by the extra route column
      assert(back.count() ===
        SparkEntry.queries("q_training_corpus")(spark, sfDir).count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(out))
  }
}
