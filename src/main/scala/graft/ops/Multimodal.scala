package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.ByteHistogram16.byte_histogram16
import graft.functions.exprs.poly_hash

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata. The Spark-side plumbing — schema, typed Dataset,
  * batch-shaped mapPartitions decode (the Scala analog of mapInPandas),
  * codegen'd feature extraction, frame sampling — is real and tested; only
  * the media codec itself is a clearly marked deterministic STUB (the
  * container ships no image/audio libraries).
  *
  * The synthetic payload is the UTF-8 encoding of `documents.text`, so the
  * oracle can recompute every decoded value from `length(text)` arithmetic
  * while the engine goes through the actual binary path.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** documents → opaque media rows (binary payload + modality tag). */
  def encode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB media decoder. A real deployment calls the codec here (javacv /
    * libsndfile / ffmpeg); this container has none, so header fields derive
    * deterministically from the payload length. The mapPartitions shape —
    * one decoder instance per partition, streaming batches of rows — is the
    * production layout.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec handle" — stands in for an expensive native init
      val codecReady = true
      it.map { m =>
        require(codecReady)
        val len = m.payload.length
        DecodedMedia(m.media_id, m.kind, m.payload,
          width = 16 + len % 64,
          height = (16 + (len.toLong * 7) % 64).toInt, // long: no wrap at ~307MB payloads
          sample_rate = 8000 + (len % 3) * 4000,
          n_frames = 1 + len % 30)
      }
    }
  }

  private def decoded(spark: SparkSession, sfDir: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    decodeStub(encode(spark, sfDir).as[MediaRow])
  }

  val queries: Seq[Q] = Seq(

    // Decoded metadata — engine goes binary-encode → mapPartitions-decode;
    // oracle recomputes the same header arithmetic from length(text).
    Q("q_media_meta",
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(16 + length(text) % 64 AS INTEGER) AS width,
        |       CAST(16 + (length(text) * 7) % 64 AS INTEGER) AS height,
        |       CAST(8000 + (length(text) % 3) * 4000 AS INTEGER) AS sample_rate,
        |       CAST(1 + length(text) % 30 AS INTEGER) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      decoded(s, dir).toDF()
        .select("media_id", "kind", "width", "height", "sample_rate", "n_frames")
        .orderBy("media_id")
    },

    // Feature extraction: 16-bin byte histogram of the payload (codegen'd
    // expression); oracle mirrors it over ascii(char) >> 4 (ASCII text ⇒
    // chars == bytes).
    Q("q_media_features",
      """SELECT doc_id AS media_id, CAST(b AS INTEGER) AS bin,
        |       (len(list_filter(list_transform(range(1, length(text) + 1),
        |          i -> ascii(substr(text, i, 1)) // 16), x -> x = b))
        |        / length(text)) AS frac
        |FROM documents, range(0, 16) t(b)
        |ORDER BY media_id, bin""".stripMargin) { (s, dir) =>
      encode(s, dir)
        .select(col("media_id"),
          posexplode(byte_histogram16(col("payload"))).as(Seq("bin", "frac")))
        .orderBy("media_id", "bin")
    },

    // Resize stub: downsample the payload to a fixed 16-"pixel" thumbnail
    // by strided sampling (the real system calls the codec's scaler here),
    // then fingerprint it. Exercises the resize plumbing end-to-end; the
    // oracle recomputes the strided sample from the text view.
    Q("q_media_thumbs",
      s"""WITH t AS (
         |  SELECT doc_id AS media_id, text,
         |         greatest(length(text) // 16, 1) AS stride
         |  FROM documents)
         |SELECT media_id,
         |       ${Dedup.hashSql(
                  "list_reduce(list_transform(range(0, 16), i -> substr(text, CAST(i * stride + 1 AS INTEGER), 1)), (a, b) -> a || b)")} AS thumb_hash
         |FROM t ORDER BY media_id""".stripMargin) { (s, dir) =>
      val stride = greatest(floor(length(col("txt")) / 16).cast("int"), lit(1))
      val thumb = concat_ws("", transform(sequence(lit(0), lit(15)),
        i => col("txt").substr(i * stride + 1, lit(1))))
      encode(s, dir)
        // project the string view ONCE — inlining the cast would re-decode
        // the payload 17x per row
        .withColumn("txt", col("payload").cast("string"))
        .select(col("media_id"), poly_hash(thumb).as("thumb_hash"))
        .orderBy("media_id")
    },

    // Exact binary dedup: group identical payloads by md5 of the raw
    // bytes — the first pass of any media-dedup pipeline (cheap, catches
    // byte-identical re-uploads before any perceptual hashing). The digest
    // is computed per-row (narrow); only (digest, id) pairs shuffle, never
    // payloads. Oracle parity: the payload IS the UTF-8 encoding of
    // documents.text, and DuckDB's md5(VARCHAR) hashes the string's UTF-8
    // bytes — identical input bytes, identical digest.
    Q("q_media_dedup",
      """SELECT md5(text) AS digest,
        |       min(doc_id) AS keep_id,
        |       count(*) AS n_copies,
        |       CAST(min(strlen(text)) AS INTEGER) AS n_bytes
        |FROM documents
        |GROUP BY md5(text) ORDER BY keep_id""".stripMargin) { (s, dir) =>
      encode(s, dir)
        .groupBy(md5(col("payload")).as("digest"))
        .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
          min(length(col("payload"))).as("n_bytes"))
        .orderBy("keep_id")
    },

    // Frame sampling for video payloads: fixed-stride slices, each
    // fingerprinted — the shuffle-free scan layout for frame-level dedup.
    Q("q_media_frames",
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, text,
         |         least(1 + length(text) % 30, 4) AS k
         |  FROM documents WHERE doc_id % 3 = 2
         |)
         |SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
         |       ${Dedup.hashSql("substr(text, 1 + f * 32, 32)")} AS frame_hash
         |FROM v, range(0, 4) t(f)
         |WHERE f < k
         |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      decoded(s, dir).toDF()
        .filter(col("kind") === "video")
        .select(col("media_id"),
          // payload is the UTF-8 bytes of text: hash fixed-stride slices of
          // its string view (frames)
          posexplode(transform(
            sequence(lit(0), least(col("n_frames"), lit(4)) - 1),
            f => poly_hash(col("payload").cast("string").substr(f * 32 + 1, lit(32)))))
            .as(Seq("frame_idx", "frame_hash")))
        .orderBy("media_id", "frame_idx")
    }
  )
}
