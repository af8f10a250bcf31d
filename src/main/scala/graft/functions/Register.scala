package graft.functions

import org.apache.spark.sql.SparkSession
import graft.geo.StAsWkt

/** Registers the expression pack for SQL-text users:
  * `graft.functions.Register(spark)` → `SELECT poly_hash(text) FROM docs`.
  */
object Register {
  def apply(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash", es => PolyHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sim_hash30", es => SimHash30(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_ff", es => DotFF(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("count_equal", es => CountEqual(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("intersect_count_sorted",
      es => IntersectCountSorted(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("byte_histogram16",
      es => ByteHistogram16(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_as_wkt", es => StAsWkt(es.head), "scala_udf")
  }
}
