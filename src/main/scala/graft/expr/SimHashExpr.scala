package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash from an array of token hashes (q43's hot
  * loop): tally[j] += ±1 per token depending on bit j of the hash,
  * output bit j set iff tally[j] > 0. The HOF spelling (aggregate +
  * zip_with over a 32-lane accumulator array) walks the interpreted
  * lambda machinery 32× per token and allocates a fresh 32-element
  * array per fold step — ~160 M lambda evals + 5 M allocations at
  * sf1; this is one primitive loop with a stack tally. Bit-identical
  * to the HOF form for hashes in [0, 2³²) with no null elements (the
  * q43 pipeline guarantees both: first-8-hex md5 values of non-null
  * tokens); EdgeCaseSpec pins the equivalence. A null ELEMENT — which
  * the type checker cannot exclude, because internal pipelines carry
  * containsNull = true array types whose values are in fact never
  * null — is a pipeline bug and throws IllegalArgumentException
  * rather than reading an engine-representation-dependent slot
  * (round-6 ADVICE). */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(th: Any): Any =
    SimHashExpr.compute(th.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, th => s"graft.expr.SimHashExpr.compute($th)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  /** static kernel: majority vote per bit over the token hashes. */
  def compute(th: ArrayData): Long = {
    val tally = new Array[Long](32)
    val n = th.numElements()
    var i = 0
    while (i < n) {
      if (th.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_simhash32: null token hash at index $i — the input " +
            "array must be null-free (hash the tokens null-safely upstream)")
      val h = th.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) tally(j) += 1L else tally(j) -= 1L
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 32) {
      if (tally(j) > 0L) sh |= 1L << j
      j += 1
    }
    sh
  }
}
