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

  test("real BMP/WAV codec round-trips construction parameters for every document") {
    // parse(build(id)) must round-trip construction parameters exactly,
    // for every document — the decode genuinely reads the bytes (the
    // oracle separately recomputes the same values arithmetically)
    import spark.implicits._
    val dec = ops.Multimodal.decodeReal(ops.Multimodal.encodeReal(spark, sfDir))
    val df  = dec.toDF().cache()
    try {
      assert(df.filter(col("kind") === "invalid").count() === 0,
        "a built payload failed its own parser")
      assert(df.filter(col("kind") === "image" &&
        (col("width") =!= (lit(4) + col("media_id") % 8) ||
         col("height") =!= (lit(2) + col("media_id") % 5))).count() === 0)
      assert(df.filter(col("kind") === "audio" &&
        col("n_samples") =!= (lit(100) + col("media_id") % 50)).count() === 0)
    } finally df.unpersist()
  }

  test("real codec quarantines malformed payloads instead of failing the task") {
    import spark.implicits._
    // a 54-byte 'BM' header claiming width 0: rowSize 0 would satisfy the
    // size check at any height — must still quarantine
    val zeroWidthBmp = {
      val bb = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0)
        .putInt(54).putInt(40).putInt(0).putInt(7).putShort(1).putShort(24)
      bb.array()
    }
    val junk = Seq(
      ops.Multimodal.RealMedia(1L, "image", Array[Byte]('B', 'M', 3, 1)), // truncated
      ops.Multimodal.RealMedia(2L, "audio", "RIFFxxxxWAVEbroken".getBytes("US-ASCII")),
      ops.Multimodal.RealMedia(3L, "image", Array[Byte](9, 9, 9)),
      ops.Multimodal.RealMedia(4L, "image", zeroWidthBmp)).toDS()
    val out = ops.Multimodal.decodeReal(junk).collect()
    assert(out.length === 4 && out.forall(_.kind == "invalid"),
      s"malformed payloads must quarantine, got ${out.map(_.kind).toSeq}")
  }
}
