package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow
import graft.functions.ByteHistogram16.byte_histogram16

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload roundtrips: cast back to string equals source text") {
    val bad = Multimodal.encode(spark, sfDir)
      .join(Tables.documents(spark, sfDir), col("media_id") === col("doc_id"))
      .filter(col("payload").cast("string") =!= col("text"))
    assert(bad.count() === 0)
  }

  test("decode stub is deterministic and schema-complete over all kinds") {
    val d = Multimodal.decodeStub(
      Multimodal.encode(spark, sfDir).as[MediaRow]).toDF()
    assert(d.filter(col("width") < 16 || col("width") >= 80).count() === 0)
    assert(d.select("kind").distinct().count() === 3)
    val twice = Multimodal.decodeStub(
      Multimodal.encode(spark, sfDir).as[MediaRow]).toDF()
    assert(d.except(twice).count() === 0)
  }

  test("byte histogram fractions sum to 1 per payload") {
    val s = Multimodal.encode(spark, sfDir)
      .select(aggregate(byte_histogram16(col("payload")), lit(0.0), _ + _).as("s"))
    assert(s.filter(abs(col("s") - 1.0) > 1e-9).count() === 0)
  }

  test("byte histogram handles the empty payload without dividing by zero") {
    val h = Seq(Array.empty[Byte]).toDF("payload")
      .select(byte_histogram16(col("payload")).as("h"))
      .select(aggregate(col("h"), lit(0.0), _ + _).as("s"))
      .collect().head.getDouble(0)
    assert(h === 0.0)
  }

  test("frame sampling yields at most 4 frames and only for video") {
    val f = SparkEntry.queries("q_media_frames")(spark, sfDir)
    assert(f.groupBy("media_id").count().filter(col("count") > 4).count() === 0)
    assert(f.filter(col("media_id") % 3 =!= 2).count() === 0)
  }
}
