package graft

import org.apache.spark.sql.functions._
import graft.functions.ShingleGenerator.shingles

class ShingleGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("emits one row per character 3-gram with positions") {
    val got = Seq("abcde").toDF("text")
      .select(shingles(col("text"), 3).as(Seq("pos", "shingle")))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((0, "abc"), (1, "bcd"), (2, "cde")))
  }

  test("short and empty strings degrade gracefully") {
    val short = Seq("ab").toDF("text")
      .select(shingles(col("text"), 3).as(Seq("pos", "shingle"))).collect()
    assert(short.map(_.getString(1)).toSeq === Seq("ab"))
    val empty = Seq("").toDF("text")
      .select(shingles(col("text"), 3).as(Seq("pos", "shingle"))).collect()
    assert(empty.isEmpty)
  }

  test("generator agrees with the array-materializing formulation on the corpus") {
    val viaGen = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingles(col("text"), 3).as(Seq("pos", "shingle")))
      .groupBy("doc_id").agg(countDistinct("shingle").as("n"))
    val viaArr = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
        i => col("text").substr(i, lit(3))))).cast("long").as("n"))
    assert(viaGen.except(viaArr).count() === 0 && viaArr.except(viaGen).count() === 0)
  }
}
