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

  /** interpolated quantile at probability q — Spark `percentile` /
    * DuckDB quantile_cont semantics: 0-based position p = q·(W−1),
    * result = (⌈p⌉−p)·v[⌊p⌋] + (p−⌊p⌋)·v[⌈p⌉] (Spark's exact
    * interpolation spelling, so the exact-regime lookup is
    * BIT-IDENTICAL to `percentile` over the same multiset),
    * generalized to weights. EXACT while untrimmed. NaN when empty. */
  def quantileCont(q: Double): Double = {
    val w = totalWeight
    if (w == 0) return Double.NaN
    val items = new ArrayBuffer[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      levels(i).foreach(v => items += ((v, 1L << i)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val p = q * (w - 1)
    val lo = math.floor(p).toLong
    val hi = math.ceil(p).toLong
    def valueAt(pos: Long): Double = {
      var cum = 0L
      var j = 0
      while (j < sorted.size) {
        cum += sorted(j)._2
        if (cum > pos) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }
    val vlo = valueAt(lo)
    if (hi == lo) vlo
    else (hi - p) * vlo + (p - lo) * valueAt(hi)
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

/** Pending-blob merge state: input blobs are BUFFERED (not folded on
  * arrival) and folded at eval in one CANONICAL order — sorted by blob
  * bytes (content-derived, layout-free) — so the merge-order-dependent
  * trimmed regime produces the SAME summary whatever partition layout
  * delivered the blobs. Exact-regime results were order-independent
  * already; this extends partition-layout reproducibility to trimmed
  * merges. Memory bound: past `MaxPending` buffered blobs the prefix
  * is folded down eagerly (still in sorted order); beyond that bound
  * reproducibility degrades gracefully to per-arrival-batch — a rollup
  * merging more than 4096 blobs per group should pre-aggregate a
  * level (day→month→quarter), which is the warehouse shape anyway. */
final class KllMergeBuf {
  val pending: ArrayBuffer[Array[Byte]] = new ArrayBuffer[Array[Byte]]
  var acc: KllBuf = null

  def foldDown(): Unit = {
    if (pending.nonEmpty) {
      val sorted = pending.sortWith(KllExpr.blobLt)
      sorted.foreach { b =>
        val o = KllExpr.fromBlob(b)
        if (acc == null) acc = o
        else if (acc.k != o.k)
          throw new IllegalArgumentException(
            s"graft_kll_merge: mixed sketch sizes (k=${acc.k} vs k=${o.k})")
        else acc.mergeIn(o)
      }
      pending.clear()
    }
  }
}

/** `graft_kll_merge(sketch BINARY)` → BINARY — aggregate union of
  * stored quantile-sketch blobs (level-wise concatenation + compaction;
  * untrimmed blobs whose union stays ≤ k remain exact). Null inputs
  * skipped; mixed-k blobs throw (a sketch store must fix k). Blobs
  * fold in canonical (byte-sorted) order at eval — see KllMergeBuf. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeBuf] {

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

  override def createAggregationBuffer(): KllMergeBuf = new KllMergeBuf

  override def update(buf: KllMergeBuf, input: InternalRow): KllMergeBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.pending += v.asInstanceOf[Array[Byte]]
      if (buf.pending.size > KllExpr.MaxPending) buf.foldDown()
    }
    buf
  }

  override def merge(b1: KllMergeBuf, b2: KllMergeBuf): KllMergeBuf = {
    if (b2.acc != null) {
      // a fold already happened on the other side — fold ours too and
      // combine accumulators (sorted side-order: smaller blob first)
      b1.foldDown()
      if (b1.acc == null) b1.acc = b2.acc
      else {
        if (b1.acc.k != b2.acc.k)
          throw new IllegalArgumentException(
            s"graft_kll_merge: mixed sketch sizes " +
              s"(k=${b1.acc.k} vs k=${b2.acc.k})")
        b1.acc.mergeIn(b2.acc)
      }
    }
    b1.pending ++= b2.pending
    if (b1.pending.size > KllExpr.MaxPending) b1.foldDown()
    b1
  }

  override def eval(buf: KllMergeBuf): Any = {
    buf.foldDown()
    KllExpr.toBlob(if (buf.acc == null) new KllBuf(KllExpr.DefaultK)
      else buf.acc)
  }

  /** serialized form: [nPending: int]{[len: int][blob…]}…[accLen: int]
    * [accBlob…] with accLen = −1 when absent. */
  override def serialize(buf: KllMergeBuf): Array[Byte] = {
    val accBlob = if (buf.acc == null) null else KllExpr.toBlob(buf.acc)
    var bytes = 4 + buf.pending.map(4 + _.length).sum + 4 +
      (if (accBlob == null) 0 else accBlob.length)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.pending.size)
    buf.pending.foreach { b => bb.putInt(b.length); bb.put(b) }
    if (accBlob == null) bb.putInt(-1)
    else { bb.putInt(accBlob.length); bb.put(accBlob) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllMergeBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KllMergeBuf
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.pending += b
      i += 1
    }
    val accLen = bb.getInt()
    if (accLen >= 0) {
      val b = new Array[Byte](accLen)
      bb.get(b)
      buf.acc = KllExpr.fromBlob(b)
    }
    buf
  }

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

/** `graft_kll_quantiles_cont(sketch BINARY, probs ARRAY<DOUBLE>)` →
  * ARRAY<DOUBLE> — INTERPOLATED quantile lookups (Spark `percentile` /
  * DuckDB quantile_cont semantics). In the exact (untrimmed) regime
  * this is bit-identical to `percentile` over the group's values — the
  * drop-in that lets an exact-percentile query carry the mergeable
  * sketch in its plan (q152/q157's med/MAD profile) with unchanged
  * results, and degrade to ~1% rank error instead of a full sort at
  * 100 TB. */
case class KllQuantilesContExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantiles_cont requires (BINARY, ARRAY<DOUBLE>), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // empty sketch → null
  override def prettyName: String = "graft_kll_quantiles_cont"

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
          s"graft_kll_quantiles_cont: probability $p outside [0, 1]")
      out(i) = buf.quantileCont(p)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantilesContExpr =
    copy(left = newLeft, right = newRight)
}

object KllExpr {
  private[expr] val DefaultK = 4096
  private[expr] val EmptySentinel = Array[Byte](0, 0)
  private[expr] val MaxPending = 4096

  /** canonical blob order: unsigned-lexicographic bytes, length as
    * tiebreak — content-derived, so independent of partition layout. */
  private[expr] def blobLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

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
