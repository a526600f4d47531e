package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Mutable mergeable-quantile-sketch state: a compactor stack (the
  * KLL/MRL family — Karnin, Lang & Liberty 2016; Manku, Rajagopalan &
  * Lindsay 1998 — with uniform per-level capacity k). Level i holds
  * values of weight 2^i; an overfull level sorts, promotes every other
  * element to level i+1 (alternation offset cycles deterministically
  * with the compaction count — no RNG, so a fixed input multiset in a
  * fixed merge order reproduces bit-identically), and keeps the odd
  * leftover. Total weight is conserved exactly, so the sketch always
  * knows the true n.
  *
  * Exactness contract (the q150 gate regime, mirroring HllBuf/KmvBuf):
  * until the first compaction (`trimmed == false`) level 0 IS the
  * complete value multiset and every quantile is exact; past it the
  * summary answers with ~1% rank error at k = 4096 (KllSpec pins
  * planted-distribution bounds). Unlike the hash sketches, the trimmed
  * estimate depends on merge ORDER (inherent to compaction); the
  * exact regime does not — level-0 concatenation is a multiset union.
  */
final class KllBuf(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(new ArrayBuffer[Double])
  var trimmed: Boolean = false
  var compactCount: Int = 0

  def add(v: Double): Unit = { levels(0) += v; compactFrom(0) }

  private def compactFrom(start: Int): Unit = {
    var i = start
    while (i < levels.size) {
      if (levels(i).size > k) compact(i)
      i += 1
    }
  }

  private def compact(i: Int): Unit = {
    val arr = levels(i)
    arr.sortInPlace()
    if (i + 1 == levels.size) levels += new ArrayBuffer[Double]
    val off = compactCount & 1
    val m = arr.size / 2
    val promoted = new ArrayBuffer[Double](m)
    var j = 0
    while (j < m) { promoted += arr(2 * j + off); j += 1 }
    val leftover = if (arr.size % 2 == 1) Some(arr(arr.size - 1)) else None
    arr.clear()
    leftover.foreach(arr += _)
    levels(i + 1) ++= promoted
    compactCount += 1
    trimmed = true
  }

  def mergeIn(o: KllBuf): Unit = {
    var i = 0
    while (i < o.levels.size) {
      if (i == levels.size) levels += new ArrayBuffer[Double]
      levels(i) ++= o.levels(i)
      i += 1
    }
    trimmed ||= o.trimmed
    compactCount += o.compactCount
    compactFrom(0)
  }

  def totalWeight: Long = {
    var w = 0L; var i = 0
    while (i < levels.size) { w += levels(i).size.toLong << i; i += 1 }
    w
  }

  /** quantile at probability q — DuckDB quantile_disc semantics: the
    * value at 0-based sorted position max(0, ⌈q·W⌉ − 1), generalized
    * to weights (a weight-w value covers w positions). EXACT while
    * untrimmed. NaN for an empty sketch. */
  def quantile(q: Double): Double = {
    val w = totalWeight
    if (w == 0) return Double.NaN
    val items = new ArrayBuffer[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      levels(i).foreach(v => items += ((v, 1L << i)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(0L, math.ceil(q * w).toLong - 1L)
    var cum = 0L
    var j = 0
    while (j < sorted.size) {
      cum += sorted(j)._2
      if (cum > target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }
}

/** `graft_kll_sketch(value DOUBLE, k)` → BINARY — re-mergeable quantile
  * sketch aggregate, completing the engine's sketch warehouse:
  * membership (`graft_bloom_agg`), distinct count (`graft_hll_*`), set
  * algebra (`graft_kmv_*`), frequency (`graft_topk_freq`) — and now
  * order statistics. Persist one small blob per (entity, day), answer
  * "p99 latency this quarter" by MERGING stored blobs
  * (`graft_kll_merge` → `graft_kll_quantiles`) instead of rescanning
  * raw history — the same deployment shape as q144's HLL rollup, for
  * the one statistic (quantiles) that is NOT partial-aggregable in
  * plain SQL (a percentile cannot be combined from per-group
  * percentiles; the sketch is what makes it mergeable).
  *
  * Scale: the exact spelling (q79) sorts every group's full value set;
  * GK `approx_percentile` (q113) is one-shot — its buffer is not a
  * storable/re-mergeable surface. Here map tasks emit one
  * O(k·log(n/k))-double buffer per group, reducers concatenate+compact.
  * Ref behavior: the reference profiles distributions with pandas
  * `describe()` on collected frames; this is the 100 TB spelling. */
case class KllSketchAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_kll_sketch: k must be a literal")
    (child.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType | LongType) =>
        val kv = kExpr.eval()
        if (kv == null)
          return TypeCheckResult.TypeCheckFailure(
            "graft_kll_sketch: k must be non-null")
        val kl = kv.asInstanceOf[Number].longValue()
        if (kl < 8 || kl > (1 << 20))
          TypeCheckResult.TypeCheckFailure(
            s"graft_kll_sketch: k must be in [8, 2^20], got $kl")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_sketch requires (DOUBLE, INT), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double]) // nulls don't count
    buf
  }

  override def merge(b1: KllBuf, b2: KllBuf): KllBuf = { b1.mergeIn(b2); b1 }

  override def eval(buf: KllBuf): Any = KllExpr.toBlob(buf)
  override def serialize(buf: KllBuf): Array[Byte] = KllExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): KllBuf =
    KllExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `graft_kll_merge(sketch BINARY)` → BINARY — aggregate union of
  * stored quantile-sketch blobs (level-wise concatenation + compaction;
  * untrimmed blobs whose union stays ≤ k remain exact). Null inputs
  * skipped; mixed-k blobs throw (a sketch store must fix k). */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case a => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_merge requires BINARY, got ${a.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"

  /** k unknown until the first sketch arrives (HllMergeAgg pattern). */
  override def createAggregationBuffer(): KllBuf = new KllBuf(0)

  private def requireSameK(a: Int, b: Int): Unit =
    if (a != b)
      throw new IllegalArgumentException(
        s"graft_kll_merge: mixed sketch sizes (k=$a vs k=$b)")

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val o = KllExpr.fromBlob(v.asInstanceOf[Array[Byte]])
      if (buf.k == 0) o
      else { requireSameK(buf.k, o.k); buf.mergeIn(o); buf }
    }
  }

  override def merge(b1: KllBuf, b2: KllBuf): KllBuf =
    if (b2.k == 0) b1
    else if (b1.k == 0) b2
    else { requireSameK(b1.k, b2.k); b1.mergeIn(b2); b1 }

  override def eval(buf: KllBuf): Any =
    KllExpr.toBlob(if (buf.k == 0) new KllBuf(KllExpr.DefaultK) else buf)

  override def serialize(buf: KllBuf): Array[Byte] =
    if (buf.k == 0) KllExpr.EmptySentinel else KllExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): KllBuf =
    if (java.util.Arrays.equals(bytes, KllExpr.EmptySentinel)) new KllBuf(0)
    else KllExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0))
}

/** `graft_kll_quantiles(sketch BINARY, probs ARRAY<DOUBLE>)` →
  * ARRAY<DOUBLE> — quantile lookups on a stored/merged blob (DuckDB
  * quantile_disc position semantics; exact while untrimmed). An empty
  * sketch yields null (like quantile over an empty group). */
case class KllQuantilesExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantiles requires (BINARY, ARRAY<DOUBLE>), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // empty sketch → null
  override def prettyName: String = "graft_kll_quantiles"

  override protected def nullSafeEval(blob: Any, probs: Any): Any = {
    val buf = KllExpr.fromBlob(blob.asInstanceOf[Array[Byte]])
    if (buf.totalWeight == 0) return null
    val pa = probs.asInstanceOf[ArrayData]
    val out = new Array[Double](pa.numElements())
    var i = 0
    while (i < out.length) {
      val p = pa.getDouble(i)
      if (p < 0.0 || p > 1.0)
        throw new IllegalArgumentException(
          s"graft_kll_quantiles: probability $p outside [0, 1]")
      out(i) = buf.quantile(p)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantilesExpr =
    copy(left = newLeft, right = newRight)
}

object KllExpr {
  private[expr] val DefaultK = 4096
  private[expr] val EmptySentinel = Array[Byte](0, 0)

  /** blob: [k: int][trimmed: byte][compactCount: int][nLevels: int]
    * { [len: int][doubles…] } per level. */
  private[expr] def toBlob(buf: KllBuf): Array[Byte] = {
    var bytes = 4 + 1 + 4 + 4
    buf.levels.foreach(l => bytes += 4 + 8 * l.size)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.k).put(if (buf.trimmed) 1.toByte else 0.toByte)
      .putInt(buf.compactCount).putInt(buf.levels.size)
    buf.levels.foreach { l =>
      bb.putInt(l.size)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  private[expr] def fromBlob(bytes: Array[Byte]): KllBuf = {
    if (bytes.length < 13)
      throw new IllegalArgumentException(
        s"graft_kll: malformed sketch blob (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    if (k < 8 || k > (1 << 20))
      throw new IllegalArgumentException(
        s"graft_kll: malformed sketch blob (k = $k)")
    val trimmed = bb.get()
    val cc = bb.getInt()
    val nLevels = bb.getInt()
    if (nLevels < 1 || nLevels > 64)
      throw new IllegalArgumentException(
        s"graft_kll: malformed sketch blob (nLevels = $nLevels)")
    val buf = new KllBuf(k)
    var i = 0
    while (i < nLevels) {
      if (i == buf.levels.size) buf.levels += new ArrayBuffer[Double]
      val n = bb.getInt()
      if (n < 0 || bb.remaining() < 8 * n)
        throw new IllegalArgumentException(
          s"graft_kll: malformed sketch blob (level $i length $n)")
      var j = 0
      while (j < n) { buf.levels(i) += bb.getDouble(); j += 1 }
      i += 1
    }
    buf.trimmed = trimmed == 1.toByte
    buf.compactCount = cc
    buf
  }
}
