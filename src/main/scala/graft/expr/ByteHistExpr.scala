package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Native multimodal "decode": `graft_byte_hist(BINARY, INT) →
  * ARRAY<DOUBLE>` — the normalized byte histogram (bucket = byte mod
  * `buckets`, counts divided by max(len, 1)) that stands in for a real
  * image/audio decoder in this container (no codec libraries
  * available — builder brief; see ops/Multimodal). Promoting it from the
  * round-2 Scala UDF to a Catalyst expression removes the
  * serialization boundary and keeps the decode stage inside
  * whole-stage codegen — and, because the payload here is UTF-8 text
  * bytes, the byte algebra is exactly reproducible in ANSI SQL, which
  * is what upgrades the multimodal pipeline from a rows-only check to
  * a full DuckDB-oracle hash match (q80/q124).
  *
  * Null payload → null; empty payload → zero vector; `buckets` must be
  * a positive INT (a zero/negative bucket count is a construction bug
  * — fail loudly, PqAdcExpr's strictness rationale).
  */
case class ByteHistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_byte_hist requires BINARY, INT, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_byte_hist"

  override protected def nullSafeEval(payload: Any, buckets: Any): Any =
    ByteHistExpr.compute(payload.asInstanceOf[Array[Byte]],
      buckets.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, b) => s"graft.expr.ByteHistExpr.compute($p, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteHistExpr =
    copy(left = newLeft, right = newRight)
}

object ByteHistExpr {
  /** shared kernel (also the mapPartitions batch-decode path in
    * ops/Multimodal): one primitive pass over the bytes. */
  def histogram(payload: Array[Byte], buckets: Int): Array[Double] = {
    if (buckets <= 0)
      throw new IllegalArgumentException(
        s"graft_byte_hist: bucket count must be positive, got $buckets")
    val hist = new Array[Double](buckets)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % buckets) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    i = 0
    while (i < buckets) { hist(i) /= n; i += 1 }
    hist
  }

  /** static kernel entry, shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte], buckets: Int): ArrayData =
    new GenericArrayData(histogram(payload, buckets))
}
