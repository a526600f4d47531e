package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product ⟨a,b⟩ over two ARRAY<DOUBLE> columns — the hot
  * kernel of the similarity queries (J2/W10). The HOF spelling
  * (`aggregate(zip_with(a, b, *), 0, +)`) materializes an intermediate
  * array per row-pair; this expression is a single primitive loop over
  * the two unsafe arrays, no allocation, codegen via static call.
  * For EQUAL-length inputs the result is bit-identical to the HOF form
  * (same left-to-right order). Length-mismatch semantics differ by
  * design: this sums over min(len) (EdgeCaseSpec pins it), while the
  * HOF form yields NULL (zip_with pads the shorter side with nulls).
  */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two ARRAY<DOUBLE>, got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.DotExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  /** static kernel: Σ a(i)·b(i) over min length, sequential order. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
