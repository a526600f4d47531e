package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable KMV (K-Minimum-Values / bottom-k theta sketch) aggregation
  * state: the k smallest DISTINCT 64-bit value hashes, unsigned order.
  *
  * Why a second distinct-count sketch next to `graft_hll_agg` (HllExpr):
  * HLL registers can only UNION — "users active on day A *and* day B"
  * (retention, audience overlap) has no HLL answer. A KMV sketch is a
  * uniform sample of the distinct-value space below a threshold θ, so
  * sketches INTERSECT: |A∩B| ≈ |{h ∈ A ∩ B : h < θ}| / θ with
  * θ = min(θ_A, θ_B) — the Datasketches theta-sketch estimator
  * (Dasgupta et al., "Theta-Sketch Framework", 2016; Beyer et al. 2007
  * for the KMV distinct estimator). Union stays available (k smallest
  * of the merged retained sets is exactly the KMV of the set union).
  *
  * Exactness contract (the gate regime, mirroring HllBuf's sparse mode):
  * while fewer than k distinct hashes have been seen (`trimmed ==
  * false`) the sketch IS the complete hash set — estimate, union and
  * intersection are all exact. Past k it degrades to the (k−1)/θ
  * estimator with ~1/√(k−2) relative standard error.
  */
final class KmvBuf(val k: Int) {
  /** retained hashes, ascending UNSIGNED order, at most k of them. */
  val set: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))
  /** true once any hash has been evicted — the sketch is no longer the
    * complete distinct-hash set and estimates switch to (k−1)/θ. */
  var trimmed: Boolean = false

  def addHash(h: Long): Unit = {
    set.add(h)
    if (set.size > k) { set.pollLast(); trimmed = true }
  }

  def mergeIn(o: KmvBuf): Unit = {
    // valid KMV union: each input retains ALL hashes below its own
    // θ, and the merged k-th minimum is ≤ both θs — so the k smallest
    // of the combined retained sets are exactly the k smallest of the
    // underlying set union
    val it = o.set.iterator()
    while (it.hasNext) addHash(it.next())
    trimmed ||= o.trimmed
  }

  /** θ as the raw unsigned hash bound: the largest retained value once
    * trimmed (estimates then use the k−1 values strictly below it). */
  def thetaRaw: Long = set.last()

  def estimate: Long =
    if (!trimmed) set.size.toLong
    else math.round((k - 1).toDouble / KmvExpr.thetaNorm(thetaRaw))
}

/** `graft_kmv_sketch(key, k)` → BINARY — re-mergeable KMV/theta sketch
  * aggregate (the `graft_hll_sketch` deployment shape: persist one
  * small blob per (entity, day) partition, answer set-algebra questions
  * later by merging/intersecting stored blobs instead of rescanning raw
  * history). k is a plan literal; the whole sketch is ONE opaque buffer
  * (TypedImperativeAggregate), so k is a memory knob (8k+9 bytes max),
  * not a plan-size knob.
  *
  * Scale story: day-over-day retention spelled exactly is a self-join
  * of (day, user) distinct pairs — at 100 TB, two full shuffles of the
  * busiest fact table per question asked. The sketch spelling
  * aggregates once into ≤ 8k-byte daily blobs and answers every
  * retention/overlap/churn pair from the blob store (q145).
  * Ref behavior: the reference profiles engagement with pandas set ops
  * on collected frames; this is the scaled spelling. */
case class KmvSketchAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_kmv_sketch: k must be a literal")
    (child.dataType, kExpr.dataType) match {
      case (StringType | LongType | IntegerType, IntegerType | LongType) =>
        val kv = kExpr.eval()
        if (kv == null)
          return TypeCheckResult.TypeCheckFailure(
            "graft_kmv_sketch: k must be non-null")
        val kl = kv.asInstanceOf[Number].longValue()
        if (kl < 16 || kl > (1 << 20))
          TypeCheckResult.TypeCheckFailure(
            s"graft_kmv_sketch: k must be in [16, 2^20], got $kl")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_sketch requires (STRING|BIGINT|INT, INT), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  // lazy: resolved only at execution (see HllAgg — analyzer transforms
  // construct copies whose children are not yet resolved)
  private lazy val hashOf: Any => Long = child.dataType match {
    case StringType => v => {
      val u = v.asInstanceOf[UTF8String]
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
        KmvExpr.Seed)
    }
    case LongType => v =>
      XXH64.hashLong(v.asInstanceOf[Long], KmvExpr.Seed)
    case IntegerType => v =>
      XXH64.hashLong(v.asInstanceOf[Int].toLong, KmvExpr.Seed)
  }

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.addHash(hashOf(v)) // nulls don't count, like COUNT(DISTINCT)
    buf
  }

  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = { b1.mergeIn(b2); b1 }

  override def eval(buf: KmvBuf): Any = KmvExpr.toBlob(buf)
  override def serialize(buf: KmvBuf): Array[Byte] = KmvExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf =
    KmvExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `graft_kmv_merge(sketch BINARY)` → BINARY — aggregate set-UNION of
  * stored KMV sketch blobs (k smallest of the combined retained sets).
  * Untrimmed ∪ untrimmed below k stays exact; rollups compose
  * (day → week → quarter without touching raw data). Null inputs are
  * skipped; mixed-k blobs throw (a sketch store must fix k). */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case a => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_merge requires BINARY, got ${a.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_merge"

  /** k is unknown until the first sketch arrives — k=0 is the empty
    * sentinel, replaced on first merge (the HllMergeAgg discipline). */
  override def createAggregationBuffer(): KmvBuf = new KmvBuf(0)

  private def requireSameK(a: Int, b: Int): Unit =
    if (a != b)
      throw new IllegalArgumentException(
        s"graft_kmv_merge: mixed sketch sizes (k=$a vs k=$b)")

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val o = KmvExpr.fromBlob(v.asInstanceOf[Array[Byte]])
      if (buf.k == 0) o
      else { requireSameK(buf.k, o.k); buf.mergeIn(o); buf }
    }
  }

  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
    if (b2.k == 0) b1
    else if (b1.k == 0) b2
    else { requireSameK(b1.k, b2.k); b1.mergeIn(b2); b1 }

  override def eval(buf: KmvBuf): Any =
    KmvExpr.toBlob(if (buf.k == 0) new KmvBuf(KmvExpr.DefaultK) else buf)

  override def serialize(buf: KmvBuf): Array[Byte] =
    if (buf.k == 0) KmvExpr.EmptySentinel else KmvExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf =
    if (java.util.Arrays.equals(bytes, KmvExpr.EmptySentinel)) new KmvBuf(0)
    else KmvExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren(0))
}

/** `graft_kmv_estimate(sketch BINARY)` → BIGINT — distinct-count
  * estimate of a stored/merged KMV blob (EXACT while untrimmed). */
case class KmvEstimateExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case a => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_estimate requires BINARY, got ${a.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_estimate"

  override protected def nullSafeEval(blob: Any): Any =
    KmvExpr.fromBlob(blob.asInstanceOf[Array[Byte]]).estimate

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expr.KmvExpr.estimateBlob($b)")

  override protected def withNewChildInternal(
      newChild: Expression): KmvEstimateExpr = copy(child = newChild)
}

/** `graft_kmv_intersect(a BINARY, b BINARY)` → BIGINT — estimated
  * |A ∩ B|, the operation HLL structurally cannot do. Theta-sketch
  * estimator: θ = the stricter of the two sketch bounds (1.0 when both
  * are untrimmed/complete), count retained hashes present in BOTH sets
  * strictly below θ, scale by 1/θ. Both-untrimmed → EXACT intersection
  * cardinality (the q145 gate regime). */
case class KmvIntersectExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_intersect requires (BINARY, BINARY), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvExpr.intersectBlobs(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.KmvExpr.intersectBlobs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_kmv_union_est(a BINARY, b BINARY)` → BIGINT — estimated
  * |A ∪ B| of exactly two blobs (the pairwise form of
  * `graft_kmv_merge` for join outputs, where the two sketches sit in
  * two COLUMNS of one row and an aggregate union does not apply).
  * Both-untrimmed below k → exact. */
case class KmvUnionEstExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_union_est requires (BINARY, BINARY), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_union_est"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvExpr.unionEstBlobs(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.KmvExpr.unionEstBlobs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnionEstExpr =
    copy(left = newLeft, right = newRight)
}

object KmvExpr {
  /** fixed hash seed — part of the sketch contract (blobs from
    * different jobs must hash identically to intersect); deliberately
    * distinct from HllExpr.Seed so the two sketch families never share
    * hash coincidences. */
  private[expr] val Seed = 0x7A3D91C4E2F08B15L

  private[expr] val DefaultK = 1024
  private[expr] val EmptySentinel = Array[Byte](0, 0)

  /** unsigned 64-bit hash → [0, 1) normalized position. */
  private[expr] def thetaNorm(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L)) / 1.8446744073709552e19

  /** codegen entries. */
  def estimateBlob(blob: Array[Byte]): Long = fromBlob(blob).estimate

  def intersectBlobs(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = fromBlob(a); val bb = fromBlob(b)
    // θ = the stricter (unsigned-smaller) of the two bounds; untrimmed
    // sketches impose no bound
    val bound: Option[Long] = (ba.trimmed, bb.trimmed) match {
      case (false, false) => None
      case (true, false) => Some(ba.thetaRaw)
      case (false, true) => Some(bb.thetaRaw)
      case (true, true) =>
        Some(if (java.lang.Long.compareUnsigned(
          ba.thetaRaw, bb.thetaRaw) <= 0) ba.thetaRaw else bb.thetaRaw)
    }
    var count = 0L
    val it = ba.set.iterator()
    while (it.hasNext) {
      val h = it.next()
      val below = bound.forall(t => java.lang.Long.compareUnsigned(h, t) < 0)
      if (below && bb.set.contains(h)) count += 1
    }
    bound match {
      case None => count
      case Some(t) => math.round(count / thetaNorm(t))
    }
  }

  def unionEstBlobs(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = fromBlob(a); val bb = fromBlob(b)
    if (ba.k != bb.k)
      throw new IllegalArgumentException(
        s"graft_kmv_union_est: mixed sketch sizes (k=${ba.k} vs k=${bb.k})")
    ba.mergeIn(bb)
    ba.estimate
  }

  /** blob form: [k: int][trimmed: byte][n: int][hashes: n longs,
    * ascending unsigned] — shared by shuffle buffers and the stored
    * sketch surface (the HllExpr.toBlob discipline). */
  private[expr] def toBlob(buf: KmvBuf): Array[Byte] = {
    val n = buf.set.size
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + 4 + 8 * n)
    bb.putInt(buf.k).put(if (buf.trimmed) 1.toByte else 0.toByte).putInt(n)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  /** parse a blob; malformed blobs throw rather than estimating wrong. */
  private[expr] def fromBlob(bytes: Array[Byte]): KmvBuf = {
    if (bytes.length < 9)
      throw new IllegalArgumentException(
        s"graft_kmv: malformed sketch blob (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    if (k < 16 || k > (1 << 20))
      throw new IllegalArgumentException(
        s"graft_kmv: malformed sketch blob (k = $k)")
    val trimmed = bb.get()
    if (trimmed != 0.toByte && trimmed != 1.toByte)
      throw new IllegalArgumentException(
        s"graft_kmv: malformed sketch blob (trimmed = $trimmed)")
    val n = bb.getInt()
    if (n < 0 || n > k || bytes.length != 9 + 8L * n)
      throw new IllegalArgumentException(
        s"graft_kmv: blob length ${bytes.length} != ${9 + 8L * math.max(n, 0)}")
    val buf = new KmvBuf(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong()); i += 1 }
    buf.trimmed = trimmed == 1.toByte
    buf
  }
}
