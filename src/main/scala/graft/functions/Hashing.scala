package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text/vector kernels shared by the dedup + similarity
  * operators, implemented as native Catalyst expressions with `doGenCode`
  * so the hot loops stay inside WholeStageCodegen (no UDF serialization,
  * no boxing). Each kernel is also expressible in DuckDB 1.0 SQL
  * (list_reduce / list_transform) — the oracle queries mirror these
  * formulas exactly.
  */
object Hashing {
  /** Polynomial rolling hash: acc = (acc*31 + codepoint) mod 1e9+7, seed 7.
    * 30-bit output. Mirrors the oracle's
    * `list_reduce(list_prepend(7, chars), (a,b) -> (a*31+b) % 1000000007)`.
    */
  final val Mod  = 1000000007L
  final val Seed = 7L

  def polyHash(s: UTF8String): Long = {
    // iterate Unicode CODE POINTS, not UTF-16 code units: the DuckDB
    // oracle's ascii(substr(..)) is codepoint-based, so supplementary-
    // plane characters must hash as one value, not a surrogate pair
    // (identical to code units for ASCII/BMP input). Plain index loop —
    // this is the hottest kernel (once per token per document); a
    // codePoints() stream would pay pipeline + iterator dispatch per call
    val str = s.toString
    var acc = Seed
    var i   = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** 30-bit SimHash over pre-hashed tokens: bit j set iff the count of
    * tokens with bit j set exceeds those without.
    */
  def simHash30(hashes: ArrayData): Long = {
    val n   = hashes.numElements()
    var sig = 0L
    var j   = 0
    while (j < 30) {
      var s = 0L
      var i = 0
      while (i < n) {
        s += (if (((hashes.getLong(i) >> j) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Number of positions where two long arrays agree — the MinHash
    * signature-agreement kernel (estimates Jaccard × length).
    */
  def countEqual(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** |A ∩ B| for two SORTED long arrays via a merge walk — O(n+m), zero
    * allocation. With distinct inputs, |A ∪ B| = |A| + |B| − |A ∩ B|.
    */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Dot product of two float vectors, accumulated in double, sequential
    * order (matches DuckDB's list_dot_product on ::DOUBLE[] to ~1 ulp).
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** 128-bit occurrence-weighted SimHash over raw token strings, as four
    * 32-bit words (packed little-endian: word i carries salted hashes
    * 2i / 2i+1 in its low / high 16 bits). Each token contributes eight
    * word-salted PolyHashes (`tok + "#w"`), of which the low 16 bits vote
    * per bit position — the production-width fingerprint (Manku et al.
    * 2007 run 64-bit; 128 matches the Norouzi MIH evaluation width) built
    * from the same public rolling hash the 30-bit SimHash uses, so the
    * DuckDB oracle reproduces every bit with list_transform arithmetic.
    */
  def simHash128(toks: ArrayData): ArrayData = {
    val n      = toks.numElements()
    val counts = new Array[Int](128)
    var i      = 0
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      var w = 0
      while (w < 8) {
        val h = polyHash(UTF8String.fromString(t + "#" + w))
        var j = 0
        while (j < 16) {
          if (((h >> j) & 1L) == 1L) counts(w * 16 + j) += 1
          else counts(w * 16 + j) -= 1
          j += 1
        }
        w += 1
      }
      i += 1
    }
    val words = new Array[Long](4)
    var b = 0
    while (b < 128) {
      if (counts(b) > 0) words(b / 32) |= (1L << (b % 32))
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(words)
  }

  /** Integer dot product of two long vectors — the scalar-quantized
    * (int8-in-long) inner-product kernel. Exact in 64 bits for any
    * |q| ≤ 127 at realistic dims (64·127² ≈ 2^20).
    */
  def dotLL(a: ArrayData, b: ArrayData): Long = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i   = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** poly_hash(string) → long. Codegen: a single static call, stays in WSCG. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** sim_hash30(array<long>) → long. */
case class SimHash30(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.simHash30(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.simHash30($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
}

/** count_equal(array<long>, array<long>) → int. */
case class CountEqual(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashing.countEqual(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.countEqual($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountEqual =
    copy(left = l, right = r)
}

/** intersect_count_sorted(array<long>, array<long>) → int (inputs sorted+distinct). */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashing.intersectCountSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountSorted =
    copy(left = l, right = r)
}

/** dot_ff(array<float>, array<float>) → double. */
case class DotFF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashing.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.dotFF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFF =
    copy(left = l, right = r)
}

/** sim_hash128(array<string>) → array<long> (four 32-bit words). */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Hashing.simHash128(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.simHash128($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

/** dot_ll(array<long>, array<long>) → long (exact integer inner product). */
case class DotLL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashing.dotLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.dotLL($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLL =
    copy(left = l, right = r)
}

/** Column-level API for the expression pack. */
object exprs {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  def poly_hash(s: Column): Column             = c(PolyHash(e(s)))
  def sim_hash30(hashes: Column): Column       = c(SimHash30(e(hashes)))
  def sim_hash128(toks: Column): Column        = c(SimHash128(e(toks)))
  def dot_ff(a: Column, b: Column): Column     = c(DotFF(e(a), e(b)))
  def dot_ll(a: Column, b: Column): Column     = c(DotLL(e(a), e(b)))
  def count_equal(a: Column, b: Column): Column = c(CountEqual(e(a), e(b)))
  def intersect_count_sorted(a: Column, b: Column): Column =
    c(IntersectCountSorted(e(a), e(b)))
}
