package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import graft.ops.Fft

/** Native Catalyst expression for the FFT magnitude spectrum (W3) — the
  * promotion of `Fft.fftMagUdf` per SURVEY.md §7 step 6: no UDF
  * serialization boundary, participates in whole-stage codegen via a
  * static kernel call (the same pattern Spark's own StaticInvoke-backed
  * functions use).
  *
  * `graft_fft_mag(ARRAY<DOUBLE>) → ARRAY<DOUBLE>`; a null ARRAY yields
  * null, null ELEMENTS are treated as 0.0 (the dense-series semantics —
  * a gap contributes nothing to the spectrum); kernel is the shared
  * radix-2/Bluestein implementation in ops/Fft (FftSpec).
  */
case class FftMagExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_fft_mag requires ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_fft_mag"

  override protected def nullSafeEval(input: Any): Any =
    FftMagExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.FftMagExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FftMagExpr =
    copy(child = newChild)
}

object FftMagExpr {
  /** static kernel entry, shared by interpreted eval and generated code.
    * Extracts elements null-aware (toDoubleArray throws on null
    * elements, reachable from SQL: graft_fft_mag(array(1.0, NULL))). */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val x = new Array[Double](n)
    var j = 0
    while (j < n) {
      x(j) = if (input.isNullAt(j)) 0.0 else input.getDouble(j)
      j += 1
    }
    val (re, im) = Fft.fftComplex(x, new Array[Double](x.length),
      invert = false)
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = math.sqrt(re(i) * re(i) + im(i) * im(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Runtime registration of the graft custom-function surface (idempotent;
  * call once per SparkSession before using the SQL names). */
/** Config-time registration: start a session with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expr.GraftExtensions` and the graft
  * function surface is available in every SQL context of the session —
  * the deployment path for a shared cluster (runtime
  * `GraftFunctions.register` remains for library embedding). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_fft_mag"),
      new ExpressionInfo(classOf[FftMagExpr].getName, "graft_fft_mag"),
      GraftFunctions.fftMagBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      GraftFunctions.dotBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottomk"),
      GraftFunctions.bottomKBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      GraftFunctions.pqEncodeBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
      GraftFunctions.pqAdcBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash32"),
      GraftFunctions.simHashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_byte_hist"),
      new ExpressionInfo(classOf[ByteHistExpr].getName, "graft_byte_hist"),
      GraftFunctions.byteHistBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_topk_freq"),
      new ExpressionInfo(classOf[TopKFreqAgg].getName, "graft_topk_freq"),
      GraftFunctions.topKFreqBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_cpc_encode"),
      new ExpressionInfo(classOf[CpcEncodeExpr].getName, "graft_cpc_encode"),
      GraftFunctions.cpcEncodeBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_gru_scan"),
      new ExpressionInfo(classOf[GruScanExpr].getName, "graft_gru_scan"),
      GraftFunctions.gruScanBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      GraftFunctions.bloomAggBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
      GraftFunctions.bloomContainsBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_any"),
      new ExpressionInfo(classOf[BloomAnyExpr].getName, "graft_bloom_any"),
      GraftFunctions.bloomAnyBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_hll_agg"),
      new ExpressionInfo(classOf[HllAgg].getName, "graft_hll_agg"),
      GraftFunctions.hllAggBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "graft_hll_sketch"),
      GraftFunctions.hllSketchBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[HllMergeAgg].getName, "graft_hll_merge"),
      GraftFunctions.hllMergeBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_hll_estimate"),
      new ExpressionInfo(classOf[HllEstimateExpr].getName, "graft_hll_estimate"),
      GraftFunctions.hllEstimateBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_sketch"),
      GraftFunctions.kmvSketchBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_merge"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "graft_kmv_merge"),
      GraftFunctions.kmvMergeBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_estimate"),
      new ExpressionInfo(classOf[KmvEstimateExpr].getName, "graft_kmv_estimate"),
      GraftFunctions.kmvEstimateBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_intersect"),
      new ExpressionInfo(classOf[KmvIntersectExpr].getName, "graft_kmv_intersect"),
      GraftFunctions.kmvIntersectBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_union_est"),
      new ExpressionInfo(classOf[KmvUnionEstExpr].getName, "graft_kmv_union_est"),
      GraftFunctions.kmvUnionEstBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZorderExpr].getName, "graft_zorder"),
      GraftFunctions.zorderBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_sketch"),
      GraftFunctions.kllSketchBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      GraftFunctions.kllMergeBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantilesExpr].getName, "graft_kll_quantiles"),
      GraftFunctions.kllQuantilesBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_kll_quantiles_cont"),
      new ExpressionInfo(classOf[KllQuantilesContExpr].getName,
        "graft_kll_quantiles_cont"),
      GraftFunctions.kllQuantilesContBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "graft_vec_sum"),
      GraftFunctions.vecSumBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_mlp_grad"),
      new ExpressionInfo(classOf[MlpGradExpr].getName, "graft_mlp_grad"),
      GraftFunctions.mlpGradBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_mlp_logit"),
      new ExpressionInfo(classOf[MlpLogitExpr].getName, "graft_mlp_logit"),
      GraftFunctions.mlpLogitBuilder))
    e.injectOptimizerRule(_ => DotRewrite)
  }
}

object GraftFunctions {
  private val fftMagId = FunctionIdentifier("graft_fft_mag")
  private val dotId = FunctionIdentifier("graft_dot")
  private val bottomKId = FunctionIdentifier("graft_bottomk")
  private val pqEncodeId = FunctionIdentifier("graft_pq_encode")
  private val pqAdcId = FunctionIdentifier("graft_pq_adc")
  private val simHashId = FunctionIdentifier("graft_simhash32")
  private val byteHistId = FunctionIdentifier("graft_byte_hist")
  private val topKFreqId = FunctionIdentifier("graft_topk_freq")
  private val cpcEncodeId = FunctionIdentifier("graft_cpc_encode")
  private val gruScanId = FunctionIdentifier("graft_gru_scan")
  private val bloomAggId = FunctionIdentifier("graft_bloom_agg")
  private val bloomContainsId = FunctionIdentifier("graft_bloom_contains")
  private val bloomAnyId = FunctionIdentifier("graft_bloom_any")
  private val hllAggId = FunctionIdentifier("graft_hll_agg")
  private val hllSketchId = FunctionIdentifier("graft_hll_sketch")
  private val hllMergeId = FunctionIdentifier("graft_hll_merge")
  private val hllEstimateId = FunctionIdentifier("graft_hll_estimate")
  private val kmvSketchId = FunctionIdentifier("graft_kmv_sketch")
  private val kmvMergeId = FunctionIdentifier("graft_kmv_merge")
  private val kmvEstimateId = FunctionIdentifier("graft_kmv_estimate")
  private val kmvIntersectId = FunctionIdentifier("graft_kmv_intersect")
  private val kmvUnionEstId = FunctionIdentifier("graft_kmv_union_est")
  private val zorderId = FunctionIdentifier("graft_zorder")
  private val kllSketchId = FunctionIdentifier("graft_kll_sketch")
  private val kllMergeId = FunctionIdentifier("graft_kll_merge")
  private val kllQuantilesId = FunctionIdentifier("graft_kll_quantiles")
  private val kllQuantilesContId = FunctionIdentifier("graft_kll_quantiles_cont")
  private val vecSumId = FunctionIdentifier("graft_vec_sum")
  private val mlpGradId = FunctionIdentifier("graft_mlp_grad")
  private val mlpLogitId = FunctionIdentifier("graft_mlp_logit")

  // shared builders (runtime registry + GraftExtensions) with arity
  // checks — a one-arg graft_bottomk call must fail analysis with a
  // clear message, not IndexOutOfBounds
  private def arity(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name takes exactly $n argument(s), got ${children.length}")

  private[expr] val fftMagBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_fft_mag", 1, ch); FftMagExpr(ch.head)
  }
  private[expr] val dotBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_dot", 2, ch); DotExpr(ch(0), ch(1))
  }
  private[expr] val bottomKBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_bottomk", 2, ch)
    BottomKAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val pqEncodeBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_pq_encode", 2, ch); PqEncodeExpr(ch(0), ch(1))
  }
  private[expr] val pqAdcBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_pq_adc", 2, ch); PqAdcExpr(ch(0), ch(1))
  }
  private[expr] val simHashBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_simhash32", 1, ch); SimHashExpr(ch.head)
  }
  private[expr] val byteHistBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_byte_hist", 2, ch); ByteHistExpr(ch(0), ch(1))
  }
  private[expr] val topKFreqBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_topk_freq", 2, ch)
    TopKFreqAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val cpcEncodeBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_cpc_encode", 5, ch); CpcEncodeExpr(ch)
  }
  private[expr] val gruScanBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_gru_scan", 2, ch); GruScanExpr(ch(0), ch(1))
  }
  private[expr] val bloomAggBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_bloom_agg", 3, ch)
    BloomAgg(ch(0), ch(1), ch(2)).toAggregateExpression()
  }
  private[expr] val bloomContainsBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_bloom_contains", 2, ch); BloomContainsExpr(ch(0), ch(1))
  }
  private[expr] val bloomAnyBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_bloom_any", 2, ch); BloomAnyExpr(ch(0), ch(1))
  }
  private[expr] val hllAggBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_hll_agg", 2, ch)
    HllAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val hllSketchBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_hll_sketch", 2, ch)
    HllSketchAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val hllMergeBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_hll_merge", 1, ch)
    HllMergeAgg(ch(0)).toAggregateExpression()
  }
  private[expr] val hllEstimateBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_hll_estimate", 1, ch); HllEstimateExpr(ch(0))
  }
  private[expr] val kmvSketchBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kmv_sketch", 2, ch)
    KmvSketchAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val kmvMergeBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kmv_merge", 1, ch)
    KmvMergeAgg(ch(0)).toAggregateExpression()
  }
  private[expr] val kmvEstimateBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kmv_estimate", 1, ch); KmvEstimateExpr(ch(0))
  }
  private[expr] val kmvIntersectBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kmv_intersect", 2, ch); KmvIntersectExpr(ch(0), ch(1))
  }
  private[expr] val kmvUnionEstBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kmv_union_est", 2, ch); KmvUnionEstExpr(ch(0), ch(1))
  }
  private[expr] val zorderBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_zorder", 2, ch); ZorderExpr(ch(0), ch(1))
  }
  private[expr] val kllSketchBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kll_sketch", 2, ch)
    KllSketchAgg(ch(0), ch(1)).toAggregateExpression()
  }
  private[expr] val kllMergeBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kll_merge", 1, ch)
    KllMergeAgg(ch(0)).toAggregateExpression()
  }
  private[expr] val kllQuantilesBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kll_quantiles", 2, ch); KllQuantilesExpr(ch(0), ch(1))
  }
  private[expr] val kllQuantilesContBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_kll_quantiles_cont", 2, ch); KllQuantilesContExpr(ch(0), ch(1))
  }
  private[expr] val vecSumBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_vec_sum", 1, ch)
    VecSumAgg(ch(0)).toAggregateExpression()
  }
  private[expr] val mlpGradBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_mlp_grad", 4, ch); MlpGradExpr(ch)
  }
  private[expr] val mlpLogitBuilder: Seq[Expression] => Expression = { ch =>
    arity("graft_mlp_logit", 3, ch); MlpLogitExpr(ch)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(fftMagId)) {
      registry.registerFunction(
        fftMagId,
        new ExpressionInfo(classOf[FftMagExpr].getName, "graft_fft_mag"),
        fftMagBuilder)
    }
    if (!registry.functionExists(dotId)) {
      registry.registerFunction(
        dotId,
        new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
        dotBuilder)
    }
    if (!registry.functionExists(bottomKId)) {
      registry.registerFunction(
        bottomKId,
        new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottomk"),
        bottomKBuilder)
    }
    if (!registry.functionExists(pqEncodeId)) {
      registry.registerFunction(
        pqEncodeId,
        new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
        pqEncodeBuilder)
    }
    if (!registry.functionExists(pqAdcId)) {
      registry.registerFunction(
        pqAdcId,
        new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
        pqAdcBuilder)
    }
    if (!registry.functionExists(simHashId)) {
      registry.registerFunction(
        simHashId,
        new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash32"),
        simHashBuilder)
    }
    if (!registry.functionExists(byteHistId)) {
      registry.registerFunction(
        byteHistId,
        new ExpressionInfo(classOf[ByteHistExpr].getName, "graft_byte_hist"),
        byteHistBuilder)
    }
    if (!registry.functionExists(topKFreqId)) {
      registry.registerFunction(
        topKFreqId,
        new ExpressionInfo(classOf[TopKFreqAgg].getName, "graft_topk_freq"),
        topKFreqBuilder)
    }
    if (!registry.functionExists(cpcEncodeId)) {
      registry.registerFunction(
        cpcEncodeId,
        new ExpressionInfo(classOf[CpcEncodeExpr].getName, "graft_cpc_encode"),
        cpcEncodeBuilder)
    }
    if (!registry.functionExists(gruScanId)) {
      registry.registerFunction(
        gruScanId,
        new ExpressionInfo(classOf[GruScanExpr].getName, "graft_gru_scan"),
        gruScanBuilder)
    }
    if (!registry.functionExists(bloomAggId)) {
      registry.registerFunction(
        bloomAggId,
        new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
        bloomAggBuilder)
    }
    if (!registry.functionExists(bloomContainsId)) {
      registry.registerFunction(
        bloomContainsId,
        new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
        bloomContainsBuilder)
    }
    if (!registry.functionExists(bloomAnyId)) {
      registry.registerFunction(
        bloomAnyId,
        new ExpressionInfo(classOf[BloomAnyExpr].getName, "graft_bloom_any"),
        bloomAnyBuilder)
    }
    if (!registry.functionExists(hllAggId)) {
      registry.registerFunction(
        hllAggId,
        new ExpressionInfo(classOf[HllAgg].getName, "graft_hll_agg"),
        hllAggBuilder)
    }
    if (!registry.functionExists(hllSketchId)) {
      registry.registerFunction(
        hllSketchId,
        new ExpressionInfo(classOf[HllSketchAgg].getName, "graft_hll_sketch"),
        hllSketchBuilder)
    }
    if (!registry.functionExists(hllMergeId)) {
      registry.registerFunction(
        hllMergeId,
        new ExpressionInfo(classOf[HllMergeAgg].getName, "graft_hll_merge"),
        hllMergeBuilder)
    }
    if (!registry.functionExists(hllEstimateId)) {
      registry.registerFunction(
        hllEstimateId,
        new ExpressionInfo(classOf[HllEstimateExpr].getName, "graft_hll_estimate"),
        hllEstimateBuilder)
    }
    if (!registry.functionExists(kmvSketchId)) {
      registry.registerFunction(
        kmvSketchId,
        new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_sketch"),
        kmvSketchBuilder)
    }
    if (!registry.functionExists(kmvMergeId)) {
      registry.registerFunction(
        kmvMergeId,
        new ExpressionInfo(classOf[KmvMergeAgg].getName, "graft_kmv_merge"),
        kmvMergeBuilder)
    }
    if (!registry.functionExists(kmvEstimateId)) {
      registry.registerFunction(
        kmvEstimateId,
        new ExpressionInfo(classOf[KmvEstimateExpr].getName, "graft_kmv_estimate"),
        kmvEstimateBuilder)
    }
    if (!registry.functionExists(kmvIntersectId)) {
      registry.registerFunction(
        kmvIntersectId,
        new ExpressionInfo(classOf[KmvIntersectExpr].getName, "graft_kmv_intersect"),
        kmvIntersectBuilder)
    }
    if (!registry.functionExists(kmvUnionEstId)) {
      registry.registerFunction(
        kmvUnionEstId,
        new ExpressionInfo(classOf[KmvUnionEstExpr].getName, "graft_kmv_union_est"),
        kmvUnionEstBuilder)
    }
    if (!registry.functionExists(zorderId)) {
      registry.registerFunction(
        zorderId,
        new ExpressionInfo(classOf[ZorderExpr].getName, "graft_zorder"),
        zorderBuilder)
    }
    if (!registry.functionExists(kllSketchId)) {
      registry.registerFunction(
        kllSketchId,
        new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_sketch"),
        kllSketchBuilder)
    }
    if (!registry.functionExists(kllMergeId)) {
      registry.registerFunction(
        kllMergeId,
        new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
        kllMergeBuilder)
    }
    if (!registry.functionExists(kllQuantilesId)) {
      registry.registerFunction(
        kllQuantilesId,
        new ExpressionInfo(classOf[KllQuantilesExpr].getName, "graft_kll_quantiles"),
        kllQuantilesBuilder)
    }
    if (!registry.functionExists(kllQuantilesContId)) {
      registry.registerFunction(
        kllQuantilesContId,
        new ExpressionInfo(classOf[KllQuantilesContExpr].getName,
          "graft_kll_quantiles_cont"),
        kllQuantilesContBuilder)
    }
    if (!registry.functionExists(vecSumId)) {
      registry.registerFunction(
        vecSumId,
        new ExpressionInfo(classOf[VecSumAgg].getName, "graft_vec_sum"),
        vecSumBuilder)
    }
    if (!registry.functionExists(mlpGradId)) {
      registry.registerFunction(
        mlpGradId,
        new ExpressionInfo(classOf[MlpGradExpr].getName, "graft_mlp_grad"),
        mlpGradBuilder)
    }
    if (!registry.functionExists(mlpLogitId)) {
      registry.registerFunction(
        mlpLogitId,
        new ExpressionInfo(classOf[MlpLogitExpr].getName, "graft_mlp_logit"),
        mlpLogitBuilder)
    }
    // library-embedding path for the optimizer rule (the extensions
    // path injects it at session build); extraOptimizations runs as
    // the optimizer's final user-provided batch
    if (!spark.experimental.extraOptimizations.contains(DotRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotRewrite
    }
  }

  /** bottom-k sketch aggregate column (native TypedImperativeAggregate). */
  def bottomK(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    call_function("graft_bottomk", c, org.apache.spark.sql.functions.lit(k))
  }

  /** column forms backed by the native expressions (not UDFs). */
  def fftMag(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_fft_mag", c)
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  /** PQ encode codes[m] = argmin_j round₉‖v_m − cb[m][j]‖² (native). */
  def pqEncode(spark: SparkSession, v: Column, cb: Column): Column = {
    register(spark)
    call_function("graft_pq_encode", v, cb)
  }

  /** PQ asymmetric-distance score Σ_m lut[m][codes[m]] (native). */
  def pqAdc(spark: SparkSession, codes: Column, lut: Column): Column = {
    register(spark)
    call_function("graft_pq_adc", codes, lut)
  }

  /** 32-bit SimHash over an array of token hashes (native). */
  def simHash32(spark: SparkSession, th: Column): Column = {
    register(spark)
    call_function("graft_simhash32", th)
  }

  /** normalized byte histogram of a BINARY payload (native decode). */
  def byteHist(spark: SparkSession, payload: Column, buckets: Column): Column = {
    register(spark)
    call_function("graft_byte_hist", payload, buckets)
  }

  /** Space-Saving heavy-hitters summary (native TypedImperativeAggregate). */
  def topKFreq(spark: SparkSession, key: Column, k: Int): Column = {
    register(spark)
    call_function("graft_topk_freq", key,
      org.apache.spark.sql.functions.lit(k))
  }

  /** bloom-filter build aggregate (native; blob carries k + nbits). */
  def bloomAgg(spark: SparkSession, key: Column, nbits: Long, k: Int): Column = {
    register(spark)
    call_function("graft_bloom_agg", key,
      org.apache.spark.sql.functions.lit(nbits),
      org.apache.spark.sql.functions.lit(k))
  }

  /** bloom-filter membership probe (native; geometry from the blob). */
  def bloomContains(spark: SparkSession, bloom: Column, key: Column): Column = {
    register(spark)
    call_function("graft_bloom_contains", bloom, key)
  }

  /** any-3-token-shingle bloom probe over a token array (native; one
    * primitive loop per doc — the screen's hot path). */
  def bloomAny(spark: SparkSession, bloom: Column, toks: Column): Column = {
    register(spark)
    call_function("graft_bloom_any", bloom, toks)
  }

  /** HLL distinct-count aggregate (native TypedImperativeAggregate;
    * EXACT below 2^p distinct values — the sparse regime). */
  def hllDistinct(spark: SparkSession, key: Column, p: Int): Column = {
    register(spark)
    call_function("graft_hll_agg", key,
      org.apache.spark.sql.functions.lit(p))
  }

  /** re-mergeable HLL sketch aggregate → BINARY blob (the warehouse
    * rollup surface: persist per-partition sketches, merge later). */
  def hllSketch(spark: SparkSession, key: Column, p: Int): Column = {
    register(spark)
    call_function("graft_hll_sketch", key,
      org.apache.spark.sql.functions.lit(p))
  }

  /** union of stored HLL sketch blobs → BINARY (composes: day→week→…). */
  def hllMerge(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_hll_merge", sketch)
  }

  /** distinct-count estimate of a sketch blob (exact while sparse). */
  def hllEstimate(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_hll_estimate", sketch)
  }

  /** re-mergeable KMV/theta sketch aggregate → BINARY blob (EXACT set
    * algebra below k distinct values — the retention/overlap surface). */
  def kmvSketch(spark: SparkSession, key: Column, k: Int): Column = {
    register(spark)
    call_function("graft_kmv_sketch", key,
      org.apache.spark.sql.functions.lit(k))
  }

  /** aggregate set-union of stored KMV sketch blobs → BINARY. */
  def kmvMerge(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_kmv_merge", sketch)
  }

  /** distinct-count estimate of a KMV blob (exact while untrimmed). */
  def kmvEstimate(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_kmv_estimate", sketch)
  }

  /** estimated |A ∩ B| of two KMV blobs — the op HLL cannot do. */
  def kmvIntersect(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_kmv_intersect", a, b)
  }

  /** estimated |A ∪ B| of two KMV blobs (pairwise, for join outputs). */
  def kmvUnionEst(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_kmv_union_est", a, b)
  }

  /** Morton/Z-order interleave of two bounded dims (layout key). */
  def zorder(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function("graft_zorder", x, y)
  }

  /** re-mergeable quantile sketch aggregate → BINARY blob (exact
    * until the first compaction — the untrimmed regime). */
  def kllSketch(spark: SparkSession, value: Column, k: Int): Column = {
    register(spark)
    call_function("graft_kll_sketch", value,
      org.apache.spark.sql.functions.lit(k))
  }

  /** aggregate union of stored quantile-sketch blobs → BINARY. */
  def kllMerge(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_kll_merge", sketch)
  }

  /** quantile lookups on a blob (quantile_disc semantics). */
  def kllQuantiles(spark: SparkSession, sketch: Column,
      probs: Seq[Double]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, lit}
    call_function("graft_kll_quantiles", sketch,
      array(probs.map(lit): _*))
  }

  /** interpolated quantile lookups on a blob (quantile_cont /
    * `percentile` semantics — exact-regime drop-in for the exact
    * interpolated percentile). */
  def kllQuantilesCont(spark: SparkSession, sketch: Column,
      probs: Seq[Double]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, lit}
    call_function("graft_kll_quantiles_cont", sketch,
      array(probs.map(lit): _*))
  }

  /** elementwise sum of ARRAY<DOUBLE> rows (native aggregate; one
    * fixed-size buffer per group — the dense-gradient reduction). */
  def vecSum(spark: SparkSession, v: Column): Column = {
    register(spark)
    call_function("graft_vec_sum", v)
  }

  /** per-row BCE gradient of the two-hidden-layer ReLU MLP head
    * (MlpGradExpr; bit-equal to the q160 HOF backprop chain). */
  def mlpGrad(spark: SparkSession, xz: Column, w: Column, y: Column,
      h: Int): Column = {
    register(spark)
    call_function("graft_mlp_grad", xz, w, y,
      org.apache.spark.sql.functions.lit(h))
  }

  /** forward-only logit of the same MLP head (MlpLogitExpr). */
  def mlpLogit(spark: SparkSession, xz: Column, w: Column, h: Int): Column = {
    register(spark)
    call_function("graft_mlp_logit", xz, w,
      org.apache.spark.sql.functions.lit(h))
  }

  /** native CPC encoder (CpcExprs; bit-equal to the HOF chain). */
  def cpcEncode(spark: SparkSession, v: Column, q: Column,
      w: Seq[Seq[Seq[Double]]], bias: Seq[Double],
      k2: Seq[Double]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, lit}
    val wLit = array(w.map(o =>
      array(o.map(c => array(c.map(lit): _*)): _*)): _*)
    call_function("graft_cpc_encode", v, q, wLit,
      array(bias.map(lit): _*), array(k2.map(lit): _*))
  }

  /** native Cho-GRU scan → final state (CpcExprs; bit-equal to the
    * `aggregate` fold). Gate layout: per gate (z, r, h) the rows are
    * [wv, b, U row 0, …, U row H−1]. */
  def gruScan(spark: SparkSession, xs: Column,
      w: graft.ops.Cpc.GruWeights): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, lit}
    def gateLit(wv: Seq[Double], b: Seq[Double],
        u: Seq[Seq[Double]]): Column =
      array((Seq(wv, b) ++ u).map(row => array(row.map(lit): _*)): _*)
    val wLit = array(
      gateLit(w.wz, w.bz, w.uz),
      gateLit(w.wr, w.br, w.ur),
      gateLit(w.wh, w.bh, w.uh))
    call_function("graft_gru_scan", xs, wLit)
  }
}
