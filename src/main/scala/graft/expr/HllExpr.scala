package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable HLL aggregation state: SPARSE (the exact set of 64-bit
  * value hashes) until it would outgrow the dense register file, then
  * DENSE (2^p byte registers, standard HyperLogLog). The sparse mode
  * is the exactness contract: below the cutover the aggregate returns
  * the EXACT distinct count (of 64-bit hashes — collision probability
  * n²/2⁶⁵, irrelevant at sparse sizes), which is what lets q141 sit
  * under the full DuckDB hash gate; past cutover it degrades to the
  * classic ±1.04/√m estimator. Same design as HLL++'s sparse
  * representation (Heule et al. 2013), with the full hash kept so
  * cutover loses nothing. */
final class HllBuf(val p: Int) {
  /** exact hash set while sparse; null once densified. */
  var sparse: java.util.HashSet[java.lang.Long] = new java.util.HashSet()
  /** register file once dense; null while sparse. */
  var dense: Array[Byte] = null

  def m: Int = 1 << p
  def sparseMax: Int = 1 << p // 8·m bytes of hashes vs m register bytes

  def addHash(h: Long): Unit =
    if (dense == null) {
      sparse.add(h)
      if (sparse.size > sparseMax) densify()
    } else denseAdd(h)

  private def denseAdd(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    // rank = position of first 1-bit in the remaining 64-p bits, in
    // [1, 64-p+1]; the all-zero suffix takes the max value
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p + 1
                else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rank > dense(idx)) dense(idx) = rank
  }

  def densify(): Unit = {
    dense = new Array[Byte](m)
    val it = sparse.iterator()
    while (it.hasNext) denseAdd(it.next())
    sparse = null
  }

  def mergeIn(o: HllBuf): Unit =
    if (o.dense == null) {
      val it = o.sparse.iterator()
      while (it.hasNext) addHash(it.next())
    } else {
      if (dense == null) densify()
      var i = 0
      while (i < m) {
        if (o.dense(i) > dense(i)) dense(i) = o.dense(i)
        i += 1
      }
    }

  /** estimated distinct count — EXACT while sparse. */
  def estimate: Long =
    if (dense == null) sparse.size.toLong
    else {
      val mm = m.toDouble
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / mm)
      }
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += java.lang.Math.scalb(1.0, -dense(i))
        if (dense(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * mm * mm / invSum
      val e = if (raw <= 2.5 * mm && zeros > 0)
        mm * math.log(mm / zeros) // linear counting, small range
      else raw // 64-bit hash: no large-range correction needed
      math.round(e)
    }
}

/** Native HYPERLOGLOG distinct-count aggregate —
  * `graft_hll_agg(key, p)` → BIGINT. The engine's own HLL closes the
  * documented approx_count_distinct exclusion (Series.scala q113
  * note): Spark's built-in HLL++ buffer is one plan ATTRIBUTE per
  * sketch word, so precision high enough to hash-match an exact
  * oracle explodes plan size and codegen time. This aggregate keeps
  * the whole sketch in ONE opaque buffer (the `graft_bloom_agg` /
  * `graft_topk_freq` TypedImperativeAggregate pattern), so p is a
  * memory knob, not a plan-size knob.
  *
  * Exactness regime: SPARSE up to 2^p distinct values (exact set of
  * XXH64 hashes — q141 gates this regime against COUNT(DISTINCT) in
  * DuckDB on bounded-by-construction keys), DENSE beyond (±1.04/√m
  * relative error, HllSpec pins planted-cardinality accuracy). Merge
  * is union (sparse) / register max (dense) — commutative and
  * associative, so partial aggregation composes in any partition
  * order (HllSpec pins layout independence, both regimes).
  *
  * Scale story: the exact countDistinct re-shuffles every (group,
  * value) pair — at 100 TB the dominant shuffle of a profiling query
  * (q121's cohort cells, per-source vocabulary counts). This sketch
  * makes the distinct count a partial-aggregable one-pass: each map
  * task emits one ≤ 8·2^p-byte buffer per group, reducers OR-merge.
  * Ref behavior: reference profiles distinct counts in pandas
  * (`nunique`); this is the scaled spelling. */
case class HllAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuf] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, pExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!pExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_hll_agg: p must be a literal")
    (child.dataType, pExpr.dataType) match {
      case (StringType | LongType | IntegerType, IntegerType | LongType) =>
        val pv = pExpr.eval()
        if (pv == null)
          return TypeCheckResult.TypeCheckFailure(
            "graft_hll_agg: p must be non-null")
        val pl = pv.asInstanceOf[Number].longValue()
        if (pl < 4 || pl > 16)
          TypeCheckResult.TypeCheckFailure(
            s"graft_hll_agg: p must be in [4, 16], got $pl")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_agg requires (STRING|BIGINT|INT, INT), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_agg"

  override def createAggregationBuffer(): HllBuf = new HllBuf(p)

  // lazy: resolved only at execution — constructing the node with a
  // not-yet-resolved child (analyzer transforms) must not touch
  // child.dataType
  private lazy val hashOf: Any => Long = child.dataType match {
    case StringType => v => {
      val u = v.asInstanceOf[UTF8String]
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
        HllExpr.Seed)
    }
    case LongType => v =>
      XXH64.hashLong(v.asInstanceOf[Long], HllExpr.Seed)
    case IntegerType => v =>
      XXH64.hashLong(v.asInstanceOf[Int].toLong, HllExpr.Seed)
  }

  override def update(buf: HllBuf, input: InternalRow): HllBuf = {
    val v = child.eval(input)
    if (v != null) buf.addHash(hashOf(v)) // nulls don't count, like COUNT(DISTINCT)
    buf
  }

  override def merge(b1: HllBuf, b2: HllBuf): HllBuf = { b1.mergeIn(b2); b1 }

  override def eval(buf: HllBuf): Any = buf.estimate

  /** [p: byte][mode: byte] + sparse [n: int][hashes: longs] or dense
    * [registers: 2^p bytes] — the same blob the re-mergeable sketch
    * surface (`graft_hll_sketch`) emits, so shuffle buffers and
    * stored sketches can never disagree on layout. */
  override def serialize(buf: HllBuf): Array[Byte] = HllExpr.toBlob(buf)

  override def deserialize(bytes: Array[Byte]): HllBuf =
    HllExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object HllExpr {
  /** fixed hash seed — part of the sketch contract (mergeable buffers
    * must hash identically). */
  private[expr] val Seed = 0x51ED270B12345678L

  /** codegen entry for `graft_hll_estimate`. */
  def estimateBlob(blob: Array[Byte]): Long = fromBlob(blob).estimate

  /** blob form shared by HllAgg's shuffle buffers and the
    * re-mergeable sketch surface: [p: byte][mode: byte] + sparse
    * [n: int][hashes: longs] | dense [registers: 2^p bytes]. */
  private[expr] def toBlob(buf: HllBuf): Array[Byte] =
    if (buf.dense == null) {
      val n = buf.sparse.size
      val bb = java.nio.ByteBuffer.allocate(2 + 4 + 8 * n)
      bb.put(buf.p.toByte).put(0.toByte).putInt(n)
      val it = buf.sparse.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    } else {
      val bb = java.nio.ByteBuffer.allocate(2 + buf.m)
      bb.put(buf.p.toByte).put(1.toByte).put(buf.dense)
      bb.array()
    }

  /** parse a blob back to a buffer; malformed blobs throw rather than
    * estimating wrong (the bloom-blob validator discipline). */
  private[expr] def fromBlob(bytes: Array[Byte]): HllBuf = {
    if (bytes.length < 2)
      throw new IllegalArgumentException(
        s"graft_hll: malformed sketch blob (${bytes.length} bytes)")
    val p = bytes(0).toInt
    if (p < 4 || p > 16)
      throw new IllegalArgumentException(
        s"graft_hll: malformed sketch blob (p = $p)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.get()
    val mode = bb.get()
    val buf = new HllBuf(p)
    if (mode == 0.toByte) {
      val n = bb.getInt()
      if (bytes.length != 6 + 8L * n)
        throw new IllegalArgumentException(
          s"graft_hll: sparse blob length ${bytes.length} != ${6 + 8L * n}")
      var i = 0
      while (i < n) { buf.sparse.add(bb.getLong()); i += 1 }
    } else if (mode == 1.toByte) {
      if (bytes.length != 2 + buf.m)
        throw new IllegalArgumentException(
          s"graft_hll: dense blob length ${bytes.length} != ${2 + buf.m}")
      buf.dense = new Array[Byte](buf.m)
      bb.get(buf.dense)
      buf.sparse = null
    } else throw new IllegalArgumentException(
      s"graft_hll: malformed sketch blob (mode = $mode)")
    buf
  }
}

/** `graft_hll_sketch(key, p)` → BINARY — the RE-MERGEABLE form of
  * `graft_hll_agg`: same buffer, same hashes, but the output is the
  * serialized sketch instead of the estimate. This is the warehouse
  * rollup surface (the Datasketches deployment pattern): persist one
  * small sketch per (entity, day) partition, then answer
  * week/month/all-time distinct counts by MERGING stored sketches
  * (`graft_hll_merge`) instead of rescanning raw data — at 100 TB
  * the only practical spelling of "distinct users this quarter".
  * Sparse blobs stay exact under union, so rolled-up estimates in
  * the sparse regime are exact too (the q144 gate). */
case class HllSketchAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuf] {

  private lazy val inner = HllAgg(child, pExpr)

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    inner.checkInputDataTypes()
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"

  override def createAggregationBuffer(): HllBuf =
    inner.createAggregationBuffer()
  override def update(buf: HllBuf, input: InternalRow): HllBuf =
    inner.update(buf, input)
  override def merge(b1: HllBuf, b2: HllBuf): HllBuf = { b1.mergeIn(b2); b1 }
  override def eval(buf: HllBuf): Any = HllExpr.toBlob(buf)
  override def serialize(buf: HllBuf): Array[Byte] = HllExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): HllBuf =
    HllExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** `graft_hll_merge(sketch BINARY)` → BINARY — aggregate UNION of
  * stored `graft_hll_sketch` blobs (sparse∪sparse stays sparse-exact
  * until cutover; anything∪dense is register max). Null inputs are
  * skipped (a partition with no sketch contributes nothing). The
  * merged output is itself a sketch — rollups compose
  * (day → week → month without touching raw data). */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case a => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_merge requires BINARY, got ${a.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"

  /** p is unknown until the first sketch arrives — an empty buffer
    * is a 0-entry sparse set at a sentinel precision, replaced on
    * first merge. */
  override def createAggregationBuffer(): HllBuf = new HllBuf(0)

  private def mergeBlob(buf: HllBuf, blob: Array[Byte]): HllBuf = {
    val o = HllExpr.fromBlob(blob)
    if (buf.p == 0) o
    else if (buf.p != o.p)
      throw new IllegalArgumentException(
        s"graft_hll_merge: mixed precisions (p=${buf.p} vs p=${o.p})")
    else { buf.mergeIn(o); buf }
  }

  override def update(buf: HllBuf, input: InternalRow): HllBuf = {
    val v = child.eval(input)
    if (v == null) buf else mergeBlob(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(b1: HllBuf, b2: HllBuf): HllBuf =
    if (b2.p == 0) b1
    else if (b1.p == 0) b2
    else if (b1.p != b2.p)
      throw new IllegalArgumentException(
        s"graft_hll_merge: mixed precisions (p=${b1.p} vs p=${b2.p})")
    else { b1.mergeIn(b2); b1 }

  override def eval(buf: HllBuf): Any =
    HllExpr.toBlob(if (buf.p == 0) new HllBuf(12) else buf)

  override def serialize(buf: HllBuf): Array[Byte] =
    if (buf.p == 0) Array[Byte](0, 0) else HllExpr.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): HllBuf =
    if (bytes.length == 2 && bytes(0) == 0.toByte) new HllBuf(0)
    else HllExpr.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren(0))
}

/** `graft_hll_estimate(sketch BINARY)` → BIGINT — the distinct-count
  * estimate of a stored/merged sketch (exact while sparse). */
case class HllEstimateExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case a => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_estimate requires BINARY, got ${a.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_estimate"

  override protected def nullSafeEval(blob: Any): Any =
    HllExpr.fromBlob(blob.asInstanceOf[Array[Byte]]).estimate

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.expr.HllExpr.estimateBlob($b)")

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimateExpr = copy(child = newChild)
}
