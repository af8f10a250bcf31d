package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** byte_histogram16(binary) → array<double>: fraction of payload bytes per
  * 16-wide bucket (byte >> 4). The feature-extraction kernel for opaque
  * media payloads — codegen'd, no boxing per byte.
  */
object ByteHistogram {
  def hist16(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    val n   = math.max(bytes.length, 1).toDouble
    val out = new Array[Any](16)
    i = 0
    while (i < 16) { out(i) = counts(i) / n; i += 1 }
    new GenericArrayData(out)
  }
}

case class ByteHistogram16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ByteHistogram.hist16(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteHistogram.hist16($c)")
  override protected def withNewChildInternal(newChild: Expression): ByteHistogram16 =
    copy(child = newChild)
}

object ByteHistogram16 {
  def byte_histogram16(c: Column): Column =
    GraftSqlBridge.column(ByteHistogram16(GraftSqlBridge.expression(c)))
}
