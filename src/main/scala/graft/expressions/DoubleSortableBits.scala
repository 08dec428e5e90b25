package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 double → signed long bit map:
  * `x < y  ⇔  sortableBits(x) < sortableBits(y)` for all doubles
  * (with -0.0 < 0.0, NaN above +Inf — total order).
  *
  * The point: a `max()` over this long is a HashAggregate with
  * map-side partials, so score-argmax patterns (nearest-neighbor
  * top-1, latest-by-score) can run in ONE hash-agg pass instead of a
  * WindowExec over the pair stream — `max(struct(score, id))` would
  * fall back to SortAggregate (immutable buffer). Packed with a
  * tie-break term into a decimal, it totally orders (score, id).
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"double_sortable_bits requires a double input, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($x);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** Inverse of [[DoubleSortableBits]] — the bit map is an involution on
  * the 64-bit pattern (`b ^ ((b >> 63) & 0x7fff…)` applied twice is the
  * identity), so decoding is the same transform followed by
  * `longBitsToDouble`. Round-trips every double bit-exactly, which is
  * what lets an argmax carry only the sortable long through the
  * aggregation and still emit the original score.
  */
case class SortableBitsToDouble(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sortable_bits_to_double requires a long input, got ${other.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any = {
    val e = x.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(e ^ ((e >> 63) & 0x7fffffffffffffffL))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"${ev.value} = java.lang.Double.longBitsToDouble($x ^ (($x >> 63) & 0x7fffffffffffffffL));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object DoubleSortableBits {

  /** Column API: order-preserving long bits of a double column. */
  def sortableBits(x: Column): Column =
    ColumnBridge.column(DoubleSortableBits(ColumnBridge.expression(x)))

  /** Column API: exact inverse — sortable long bits back to the double. */
  def fromSortableBits(x: Column): Column =
    ColumnBridge.column(SortableBitsToDouble(ColumnBridge.expression(x)))
}
