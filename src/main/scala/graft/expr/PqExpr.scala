package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encode: codes[m] = argmin_j over the
  * sub-space codebook of round₉(Σ(xᵢ−yᵢ)²), lowest j on ties — the
  * exact argmin the q114 oracle computes. The HOF spelling (nested
  * `transform` + `zip_with`/`aggregate` over M·K codewords) walks the
  * interpreted-lambda machinery ~2k times per row and measured ~2 s
  * per million distance evals; this is one primitive loop, no
  * allocation beyond the output codes, codegen via static call.
  * Rounding uses scala BigDecimal HALF_UP — the same routine Spark's
  * `round(col, 9)` applies, so the native path is bit-compatible with
  * the HOF spelling (PqRecallSpec pins the equivalence).
  *
  * Shapes: v ARRAY<DOUBLE> (the full vector), cb
  * ARRAY<ARRAY<ARRAY<DOUBLE>>> (cb[m][j] = codeword j of sub-space m);
  * sub-vector m of v is v[m·SUB .. m·SUB+SUB) with SUB = len(cb[m][j]).
  */
case class PqEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires ARRAY<DOUBLE>, ARRAY<ARRAY<ARRAY<DOUBLE>>>, " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    PqEncodeExpr.compute(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb) => s"graft.expr.PqEncodeExpr.compute($v, $cb)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object PqEncodeExpr {
  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** static kernel: per sub-space argmin codeword by rounded squared
    * L2, lowest codeword index on ties. STRICT on geometry, like
    * PqAdcExpr: a vector shorter or longer than the codebook's M·SUB
    * elements, or a null element (the type checker can't exclude
    * containsNull = true inputs), means vector and codebook were built
    * with different PQ geometry — a construction bug that must fail the
    * query, not silently read out-of-range/garbage slots and rank
    * wrong neighbors (round-6 ADVICE). */
  def compute(v: ArrayData, cb: ArrayData): ArrayData = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pq_encode: null vector element at index $i — the " +
            "input vector must be null-free")
      i += 1
    }
    val m = cb.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cws = cb.getArray(mi)
      val k = cws.numElements()
      if (k == 0)
        throw new IllegalArgumentException(
          s"graft_pq_encode: sub-space $mi has no codewords")
      // ONE dimensionality per sub-space: a ragged codebook (codewords
      // of different lengths inside one sub-space) would compare
      // distances across different dimensionalities — reject it rather
      // than rank on meaningless numbers
      val sub = cws.getArray(0).numElements()
      if (off + sub > n)
        throw new IllegalArgumentException(
          s"graft_pq_encode: vector has $n elements but sub-space $mi " +
            s"needs [${off}, ${off + sub}) — codebook/vector geometry mismatch")
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val cw = cws.getArray(j)
        if (cw.numElements() != sub)
          throw new IllegalArgumentException(
            s"graft_pq_encode: ragged codebook — sub-space $mi codeword $j " +
              s"has ${cw.numElements()} dims, expected $sub")
        var d = 0.0
        i = 0
        while (i < sub) {
          val diff = v.getDouble(off + i) - cw.getDouble(i)
          d += diff * diff
          i += 1
        }
        val dr = round9(d)
        if (dr < bestD) { bestD = dr; best = j }
        j += 1
      }
      codes(mi) = best
      off += sub
      mi += 1
    }
    if (off != n)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has $n elements but the codebook's " +
          s"sub-spaces cover only $off — codebook/vector geometry mismatch")
    new GenericArrayData(codes)
  }
}

/** Native asymmetric-distance (ADC) scoring: Σ_m lut[m][codes[m]] —
  * the per-pair work of a PQ scan reduced to M table lookups, as one
  * primitive loop (the HOF spelling re-enters the lambda interpreter
  * per sub-space). codes ARRAY<INT>, lut ARRAY<ARRAY<DOUBLE>>. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>, " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcExpr.compute(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.expr.PqAdcExpr.compute($c, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  /** static kernel: Σ_m lut(m)(codes(m)), sequential order. STRICT on
    * shape: a sub-space-count mismatch or an out-of-range code means
    * the code table and LUT were built with different PQ geometry — a
    * construction bug that must fail the query, not return a plausible
    * partial sum that silently ranks wrong neighbors (EdgeCaseSpec
    * pins the error; graft_dot's min-length leniency is NOT copied
    * here for exactly that reason). */
  def compute(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m)
      throw new IllegalArgumentException(
        s"graft_pq_adc: codes has $m sub-spaces but lut has ${lut.numElements()}")
    var s = 0.0
    var i = 0
    while (i < m) {
      val row = lut.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $c out of range for lut sub-space $i " +
            s"(${row.numElements()} codewords)")
      s += row.getDouble(c)
      i += 1
    }
    s
  }
}
