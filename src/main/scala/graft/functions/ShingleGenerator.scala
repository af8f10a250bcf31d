package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** shingles(text, k): generator (UDTF) emitting one row per character
  * k-gram — the lazy row-stream form of shingling. Unlike
  * `explode(transform(sequence(...)))`, no shingle ARRAY is ever
  * materialized per document: each output row is produced on demand, which
  * is what you want when a 1 MB document would otherwise allocate a
  * million-element array (SURVEY §2.2's "explode-style Generator" cell).
  */
case class ShingleGenerator(child: Expression, k: Int)
    extends UnaryExpression with Generator with CollectionGenerator
    with CodegenFallback { // generators run through GenerateExec's eval path
  require(k >= 1, s"shingles: k must be >= 1, got $k")

  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType, nullable = false) ::
      StructField("shingle", StringType, nullable = false) :: Nil)

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)
  override val inline: Boolean          = false
  override def position: Boolean        = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      // shingle by CODE POINTS, matching substr() semantics in Spark and
      // DuckDB — UTF-16 code-unit slicing would split surrogate pairs
      val cps = s.codePoints().toArray
      val n   = math.max(cps.length - k + 1, if (cps.isEmpty) 0 else 1)
      (0 until n).iterator.map { i =>
        val end = math.min(i + k, cps.length)
        InternalRow(i, UTF8String.fromString(
          new String(cps, i, end - i)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  /** df.select(shingles($"text", 3).as(Seq("pos", "shingle"))) */
  def shingles(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleGenerator(GraftSqlBridge.expression(text), k))
}
