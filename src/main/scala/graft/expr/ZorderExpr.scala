package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_zorder(x, y)` → BIGINT — Morton/Z-order bit interleave of two
  * non-negative dimension values, the DATA-LAYOUT primitive for
  * multi-dimensional file skipping: a table written in z-value order
  * gives every file a tight min/max bounding BOX over BOTH dimensions,
  * so a 2-D range predicate prunes files the way a 1-D sort key prunes
  * only its own column. At 100 TB this is the difference between a
  * (user, time)-range query scanning every file the time-sort touches
  * (all users interleave within each time window) and scanning only
  * the files whose (user, time) box intersects the query
  * (Delta/Iceberg OPTIMIZE ZORDER ship exactly this; Morton 1966).
  *
  * Bit layout: x occupies even bit positions, y odd — z = Σ x_i·4^i +
  * 2·Σ y_i·4^i, so a right shift by 2s strips the low s bits of BOTH
  * dims at once: z >> 2s identifies the 2^s × 2^s tile containing the
  * point (the q149 gate groups on exactly that). Inputs must be in
  * [0, 2^31): layout keys are bucket/offset dims by construction, and
  * a negative or overflowing dim would corrupt the sign bit of the
  * interleave — it throws rather than silently mis-sorting 100 TB.
  *
  * Ref behavior: the reference never manages storage layout (CSVs
  * written once, read whole); this is pure scale surface. Pruning
  * effect pinned by ZorderSpec's chunked-bounding-box audit; codegen
  * is a static two-call kernel (no UDF, stays in WholeStageCodegen).
  */
case class ZorderExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires (BIGINT|INT, BIGINT|INT), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZorderExpr.zval(asLong(a), asLong(b))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.ZorderExpr.zval((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderExpr =
    copy(left = newLeft, right = newRight)
}

object ZorderExpr {
  /** spread the low 31 bits of x to even bit positions (the standard
    * magic-number dilation; each step doubles the gap). */
  private[expr] def spread(x: Long): Long = {
    var v = x
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** codegen entry: interleave — x on even bits, y on odd. */
  def zval(x: Long, y: Long): Long = {
    if (x < 0 || x >= (1L << 31) || y < 0 || y >= (1L << 31))
      throw new IllegalArgumentException(
        s"graft_zorder: dims must be in [0, 2^31), got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }
}
