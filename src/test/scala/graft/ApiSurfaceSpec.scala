package graft

import org.apache.spark.sql.functions._
import graft.geo.StAsWkt.st_as_wkt
import graft.ops.TypedSegments

/** Typed Dataset entry, JTS WKT rendering, SQL function registration. */
class ApiSurfaceSpec extends SparkSpec {

  test("Dataset[Segment] round-trips the full schema with typed fields") {
    val ds = TypedSegments.dataset(spark, sfDir)
    val s  = ds.filter(_.segmentid == 0L).head()
    assert(s.uid == 13L && s.mmsi == 316000013)
    assert(s.geom.isEmpty == (s.segmentid % 5 != 0))
    val merged = TypedSegments.merged(spark, sfDir)
    assert(merged.filter(_.geom.isEmpty).count() === 0)
    assert(merged.head().geom.get.srid === 3005)
  }

  test("st_as_wkt renders JTS WKT from the geom struct, null-through") {
    val out = ops.PostingLines.merged(spark, sfDir)
      .select(st_as_wkt(col("geom")).as("wkt"))
    val first = out.head().getString(0)
    assert(first.startsWith("LINESTRING ("), first)
    assert(ops.Segments.df(spark, sfDir)
      .select(st_as_wkt(col("geom")).as("wkt"))
      .filter(col("wkt").isNull).count() > 0, "NULL geom must render as NULL")
  }

  test("registered SQL functions evaluate from spark.sql text") {
    graft.functions.Register(spark)
    val r = spark.sql(
      "SELECT poly_hash('hello') AS h, count_equal(array(1L,2L), array(1L,3L)) AS c")
      .head()
    assert(r.getLong(0) === 299566379L)
    assert(r.getInt(1) === 1)
    // the canonicalization kernel from SQL text (decomposed e + U+0301
    // composes, case folds, whitespace collapses)
    val n = spark.sql("SELECT normalize_text('  CAFE\u0301  du\tJour ') AS t")
      .head().getString(0)
    assert(n === "café du jour", n.codePoints().toArray.toSeq.toString)
  }
}
