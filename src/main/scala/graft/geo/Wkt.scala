package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, PrecisionModel}

/** WKT rendering of the §1.3 geom struct through JTS (jts-core on the
  * classpath) — `LINESTRING (sx sy, ex ey)`. Interop/export surface, not an
  * oracle query (float→text formatting is engine-specific).
  */
object Wkt {
  private val factory = new GeometryFactory(new PrecisionModel(), 0)

  def lineWkt(sx: Double, sy: Double, ex: Double, ey: Double): String =
    factory.createLineString(
      Array(new Coordinate(sx, sy), new Coordinate(ex, ey))).toText
}

/** st_as_wkt(geom struct) → string (null-through). */
case class StAsWkt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[InternalRow]
    UTF8String.fromString(
      Wkt.lineWkt(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.geo.Wkt.lineWkt($c.getDouble(0), $c.getDouble(1),
         |                        $c.getDouble(2), $c.getDouble(3)));""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): StAsWkt =
    copy(child = newChild)
}

object StAsWkt {
  def st_as_wkt(geom: Column): Column =
    GraftSqlBridge.column(StAsWkt(GraftSqlBridge.expression(geom)))
}
