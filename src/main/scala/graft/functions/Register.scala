package graft.functions

import org.apache.spark.sql.SparkSession
import graft.geo.StAsWkt

/** Registers the expression pack for SQL-text users:
  * `graft.functions.Register(spark)` → `SELECT poly_hash(text) FROM docs`.
  */
object Register {
  private def arity[T](name: String, n: Int)(
      f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => T)(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): T = {
    require(es.length == n,
      s"$name expects $n argument(s), got ${es.length}")
    f(es)
  }

  def apply(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash",
      arity("poly_hash", 1)(es => PolyHash(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("sim_hash30",
      arity("sim_hash30", 1)(es => SimHash30(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("sim_hash128",
      arity("sim_hash128", 1)(es => SimHash128(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_ff",
      arity("dot_ff", 2)(es => DotFF(es(0), es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("count_equal",
      arity("count_equal", 2)(es => CountEqual(es(0), es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("intersect_count_sorted",
      arity("intersect_count_sorted", 2)(es => IntersectCountSorted(es(0), es(1))),
      "scala_udf")
    reg.createOrReplaceTempFunction("byte_histogram16",
      arity("byte_histogram16", 1)(es => ByteHistogram16(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("normalize_text",
      arity("normalize_text", 1)(es => NormalizeText(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("st_as_wkt",
      arity("st_as_wkt", 1)(es => StAsWkt(es.head)), "scala_udf")
    reg.createOrReplaceTempFunction("shingles",
      arity("shingles", 2) { es =>
        require(es.head.dataType == org.apache.spark.sql.types.StringType,
          s"shingles: first argument must be STRING, got ${es.head.dataType.sql}")
        require(es(1).foldable, "shingles: k must be a literal")
        val kv = es(1).eval()
        require(kv != null && kv.isInstanceOf[Number],
          s"shingles: k must be a non-null integer literal, got $kv")
        ShingleGenerator(es.head, kv.asInstanceOf[Number].intValue())
      }, "scala_udf")
  }
}
