package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed surface (SURVEY §1.2): case-class model of the reference schema
  * (sql_to_line.py:183-201) with the §1.3 geom struct. `DataFrame` stays the
  * engine-internal representation; `Dataset[Segment]` is the compile-time-
  * checked entry point for library users.
  */
object TypedSegments {

  case class Geom(sx: Double, sy: Double, ex: Double, ey: Double, srid: Int)

  case class Segment(
      segmentid: Long,
      uid: Long,
      mmsi: Int,
      starttime: Timestamp,
      duration: Int,
      startlat: Double,
      startlon: Double,
      endlat: Double,
      endlon: Double,
      isclassa: Boolean,
      classais: Short,
      classgen: Short,
      name: String,
      isunique: Boolean,
      lastchange: Timestamp,
      geom: Option[Geom],
      lenm: Option[Double],
      sogkt: Option[Double])

  /** Typed view of the synthesized segments table. */
  def dataset(spark: SparkSession, sfDir: String): Dataset[Segment] = {
    import spark.implicits._
    Segments.df(spark, sfDir).as[Segment]
  }

  /** Typed view of the post-pipeline main table. */
  def merged(spark: SparkSession, sfDir: String): Dataset[Segment] = {
    import spark.implicits._
    PostingLines.merged(spark, sfDir).as[Segment]
  }
}
