package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Hashing
import graft.functions.exprs._

/** Kernel-level checks for the codegen'd expressions, cross-checked against
  * values computed independently in DuckDB 1.0 this session.
  */
class HashingSpec extends SparkSpec {

  test("polyHash matches the DuckDB list_reduce reference value") {
    // SELECT list_reduce(list_prepend(7, [ascii chars of 'hello']),
    //                    (a,b) -> (a*31+b) % 1000000007) = 299566379
    assert(Hashing.polyHash(UTF8String.fromString("hello")) === 299566379L)
    assert(Hashing.polyHash(UTF8String.fromString("")) === 7L)
  }

  test("polyHash treats supplementary-plane characters as one code point") {
    // U+1F600 (😀) = code point 128512: one term, not a surrogate pair —
    // matching DuckDB's codepoint-based ascii(substr(..)) oracle formula
    assert(Hashing.polyHash(UTF8String.fromString(new String(
      Character.toChars(0x1F600)))) === (7L * 31L + 128512L) % Hashing.Mod)
  }

  test("polyHash expression evaluates through the engine with codegen") {
    import spark.implicits._
    val out = Seq("hello", "", "the").toDF("s")
      .select(poly_hash(col("s")).as("h")).collect().map(_.getLong(0))
    assert(out(0) === 299566379L)
    assert(out(1) === 7L)
    assert(out(2) === Hashing.polyHash(UTF8String.fromString("the")))
  }

  test("simHash30: all-ones hashes set every bit; empty input sets none") {
    val allOnes = new GenericArrayData(Array.fill(3)((1L << 30) - 1))
    assert(Hashing.simHash30(allOnes) === (1L << 30) - 1)
    assert(Hashing.simHash30(new GenericArrayData(Array.empty[Long])) === 0L)
  }

  test("simHash30 majority vote per bit") {
    // bit 0: two of three set → 1; bit 1: one of three → 0
    val hs = new GenericArrayData(Array(1L, 1L, 2L))
    assert(Hashing.simHash30(hs) === 1L)
  }

  test("dotFF accumulates float products in double, sequential order") {
    val a = new GenericArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = new GenericArrayData(Array(4.0f, 5.0f, 6.0f))
    assert(Hashing.dotFF(a, b) === 32.0)
    assert(Hashing.dotFF(a, a) === 14.0)
  }

  test("dot_ff expression equals the functions.aggregate/zip_with composition") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("embedding"),
        dot_ff(col("embedding"), col("embedding")).as("fast"),
        aggregate(
          zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }
}
