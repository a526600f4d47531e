package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the q75 CPC encoder hot path. The HOF spelling
  * (oneHotFuse → conv1dChannels → relu-collapse → conv1dSame → relu,
  * then a GRU `aggregate` fold) re-enters the interpreted-lambda
  * machinery per (t, o, c, d) — measured 2.4 s (conv) + 1.3 s (GRU) of
  * q75's 5.0 s at sf0.1. These expressions run the SAME arithmetic in
  * the SAME operation order as one primitive loop per row (CpcSpec
  * pins bit-equality against the HOF spelling on the real corpus, the
  * graft_simhash32 / native-matVec discipline), so the DuckDB oracle
  * hash is unchanged by construction.
  *
  * Bit-equality notes (why the loops look pedantic):
  *  - the HOF conv reduces its (c-major, d-minor) term list LEFT-
  *    ASSOCIATIVELY starting from the FIRST term (no 0.0 seed), adds
  *    bias LAST, and multiplies out-of-one-hot lanes as literal
  *    `0.0 * w` — all replicated, because an added 0.0 seed or a
  *    skipped zero product can flip a −0.0;
  *  - relu is Spark `greatest(x, 0.0)` = java Math.max(x, 0.0)
  *    (identical −0.0/NaN semantics);
  *  - the GRU gate linear term is ((w·x) + b) + Σ_j u·h with the inner
  *    Σ left-associated from its first term; sigmoid is spelled
  *    1.0 / (1.0 + exp(−t)) exactly as the Column form.
  */

/** graft_cpc_encode(v ARRAY<DOUBLE>, q ARRAY<INT>, w
  * ARRAY<ARRAY<ARRAY<DOUBLE>>> (out-ch × in-ch × taps), bias
  * ARRAY<DOUBLE>, k2 ARRAY<DOUBLE>) → z ARRAY<DOUBLE>:
  * z = relu(conv1dSame(Σ_o relu(conv1dChannels(oneHotFuse(v, q))_o), k2)).
  * Weight args must be foldable literals (weights are inputs, SURVEY
  * §2.9 M5); they are decoded once per executor, not per row. */
case class CpcEncodeExpr(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 5)
      return TypeCheckResult.TypeCheckFailure("graft_cpc_encode takes 5 args")
    if (!children.drop(2).forall(_.foldable))
      return TypeCheckResult.TypeCheckFailure(
        "graft_cpc_encode: w, bias, k2 must be literals (weights are inputs)")
    val d3 = ArrayType(ArrayType(ArrayType(DoubleType, false), false), false)
    val d1 = ArrayType(DoubleType, false)
    def sameShape(t: DataType, want: DataType): Boolean = (t, want) match {
      case (ArrayType(a, _), ArrayType(b, _)) => sameShape(a, b)
      case (a, b) => a == b
    }
    // fail ANALYSIS with a real message, not a per-row executor CCE
    // (the registry's arity-check discipline)
    (children(0).dataType, children(1).dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        if (!sameShape(children(2).dataType, d3))
          TypeCheckResult.TypeCheckFailure(
            s"graft_cpc_encode: w must be ARRAY<ARRAY<ARRAY<DOUBLE>>>, got " +
              children(2).dataType.simpleString)
        else if (!sameShape(children(3).dataType, d1) ||
            !sameShape(children(4).dataType, d1))
          TypeCheckResult.TypeCheckFailure(
            "graft_cpc_encode: bias and k2 must be ARRAY<DOUBLE>")
        else {
          // shapes are foldable — validate bias/out-channel agreement
          // at analysis too
          val wv = children(2).eval().asInstanceOf[ArrayData]
          val bv = children(3).eval().asInstanceOf[ArrayData]
          if (wv == null || bv == null)
            TypeCheckResult.TypeCheckFailure(
              "graft_cpc_encode: w and bias must be non-null literals")
          else if (bv.numElements() != wv.numElements())
            TypeCheckResult.TypeCheckFailure(
              s"graft_cpc_encode: bias has ${bv.numElements()} entries but " +
                s"w has ${wv.numElements()} output channels")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_cpc_encode: v must be ARRAY<DOUBLE> and q ARRAY<INT>, " +
          s"got ${a.simpleString} / ${b.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = children(0).nullable || children(1).nullable
  override def prettyName: String = "graft_cpc_encode"

  @transient private lazy val w: Array[Array[Array[Double]]] = {
    val ad = children(2).eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { o =>
      val co = ad.getArray(o)
      Array.tabulate(co.numElements()) { c => co.getArray(c).toDoubleArray() }
    }
  }
  @transient private lazy val bias: Array[Double] =
    children(3).eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val k2: Array[Double] =
    children(4).eval().asInstanceOf[ArrayData].toDoubleArray()

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = children(0).eval(input)
    val q = children(1).eval(input)
    if (v == null || q == null) null
    else compute(v.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
  }

  def compute(v: ArrayData, q: ArrayData): ArrayData = {
    val n = v.numElements()
    if (q.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_cpc_encode: v has $n elements but q has ${q.numElements()}")
    val vs = new Array[Double](n)
    val qs = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i) || q.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_cpc_encode: null element at index $i — series arrays " +
            "must be null-free")
      vs(i) = v.getDouble(i); qs(i) = q.getInt(i); i += 1
    }
    new GenericArrayData(CpcEncodeExpr.encode(vs, qs, w, bias, k2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cpcEncode", this, classOf[CpcEncodeExpr].getName)
    val vGen = children(0).genCode(ctx)
    val qGen = children(1).genCode(ctx)
    val blk =
      code"""
        ${vGen.code}
        ${qGen.code}
        boolean ${ev.isNull} = ${vGen.isNull} || ${qGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.compute(${vGen.value}, ${qGen.value});
        }
      """
    ev.copy(code = blk)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CpcEncodeExpr =
    copy(children = newChildren)
}

object CpcEncodeExpr {
  /** the fused encoder kernel; see the bit-equality notes above. */
  def encode(v: Array[Double], q: Array[Int], w: Array[Array[Array[Double]]],
             bias: Array[Double], k2: Array[Double]): Array[Double] = {
    val n = v.length
    val nOut = w.length
    val nCh = if (nOut > 0) w(0).length else 0
    val taps = if (nCh > 0) w(0)(0).length else 0
    val center = taps / 2
    val z1 = new Array[Double](n)
    var t = 0
    while (t < n) {
      // Σ_o max(enc_o, 0): enc_o = leftReduce_{c,d}(term) + bias(o),
      // term = in-range ? fused(j)(c) * w(o)(c)(d) : 0.0,
      // fused(j)(c) = (q(j) == c) ? v(j) : 0.0  — multiply ALWAYS
      var s = 0.0
      var o = 0
      while (o < nOut) {
        var acc = 0.0
        var first = true
        var c = 0
        while (c < nCh) {
          var d = 0
          while (d < taps) {
            val j = t + (d - center)
            val term =
              if (j >= 0 && j < n)
                (if (q(j) == c) v(j) else 0.0) * w(o)(c)(d)
              else 0.0
            if (first) { acc = term; first = false } else acc = acc + term
            d += 1
          }
          c += 1
        }
        val enc = acc + bias(o)
        val r = java.lang.Math.max(enc, 0.0)
        s = if (o == 0) r else s + r
        o += 1
      }
      z1(t) = s
      t += 1
    }
    // z = relu(conv1dSame(z1, k2))
    val kTaps = k2.length
    val kCenter = kTaps / 2
    val out = new Array[Double](n)
    t = 0
    while (t < n) {
      var acc = 0.0
      var first = true
      var d = 0
      while (d < kTaps) {
        val j = t + (d - kCenter)
        val term = if (j >= 0 && j < n) z1(j) * k2(d) else 0.0
        if (first) { acc = term; first = false } else acc = acc + term
        d += 1
      }
      out(t) = java.lang.Math.max(acc, 0.0)
      t += 1
    }
    out
  }
}

/** graft_gru_scan(xs ARRAY<DOUBLE>, w ARRAY<ARRAY<ARRAY<DOUBLE>>>) →
  * final hidden state ARRAY<DOUBLE>(H). Cho-convention GRU, zero
  * initial state — the exact fold `Cpc.gruScan` spells as an
  * `aggregate` HOF. Weight literal layout: w(g) for g = 0 (z), 1 (r),
  * 2 (h), each (H + 2) rows of H doubles: row 0 = input weights wv,
  * row 1 = bias b, rows 2..H+1 = the recurrent matrix U's rows. */
case class GruScanExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_gru_scan requires (ARRAY<DOUBLE>, literal " +
          "ARRAY<ARRAY<ARRAY<DOUBLE>>>)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_gru_scan"

  @transient private lazy val gates: Array[Array[Array[Double]]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { g =>
      val rows = ad.getArray(g)
      Array.tabulate(rows.numElements())(r => rows.getArray(r).toDoubleArray())
    }
  }

  override protected def nullSafeEval(xs: Any, wIgnored: Any): Any =
    compute(xs.asInstanceOf[ArrayData])

  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val h = gates(0)(0).length
    val st = new Array[Double](h)
    val zg = new Array[Double](h)
    val rg = new Array[Double](h)
    val hh = new Array[Double](h)
    var s = 0
    while (s < n) {
      if (xs.isNullAt(s))
        throw new IllegalArgumentException(
          s"graft_gru_scan: null element at index $s")
      val x = xs.getDouble(s)
      gate(gates(0), x, st, null, zg)
      gate(gates(1), x, st, null, rg)
      gate(gates(2), x, st, rg, hh)
      var i = 0
      while (i < h) {
        // h'_i = ((1 − z_i) · h_i) + (z_i · tanh/σ-candidate)
        st(i) = (1.0 - zg(i)) * st(i) + zg(i) * hh(i)
        i += 1
      }
      s += 1
    }
    new GenericArrayData(st.clone())
  }

  /** one gate: out(i) = act(((wv(i)·x) + b(i)) + leftΣ_j u(i)(j)·hOf(j));
    * hOf(j) = h(j), or r(j)·h(j) for the candidate gate (rGate != null —
    * which also selects tanh over sigmoid, matching Cpc.gruStep). */
  private def gate(gw: Array[Array[Double]], x: Double, h: Array[Double],
                   rGate: Array[Double], out: Array[Double]): Unit = {
    val hSize = h.length
    var i = 0
    while (i < hSize) {
      val wx = gw(0)(i) * x + gw(1)(i)
      var acc = 0.0
      var first = true
      var j = 0
      while (j < hSize) {
        val hj = if (rGate == null) h(j) else rGate(j) * h(j)
        val term = gw(2 + i)(j) * hj
        if (first) { acc = term; first = false } else acc = acc + term
        j += 1
      }
      val lin = wx + acc
      out(i) =
        if (rGate == null) 1.0 / (1.0 + java.lang.Math.exp(-lin))
        else java.lang.Math.tanh(lin)
      i += 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gruScan", this, classOf[GruScanExpr].getName)
    defineCodeGen(ctx, ev, (xs, _) => s"$ref.compute($xs)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GruScanExpr =
    copy(left = newLeft, right = newRight)
}
