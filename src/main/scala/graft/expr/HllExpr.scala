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

  private val hashOf: Any => Long = child.dataType match {
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
    * [registers: 2^p bytes] — both big-endian. */
  override def serialize(buf: HllBuf): Array[Byte] =
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

  override def deserialize(bytes: Array[Byte]): HllBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new HllBuf(bb.get().toInt)
    if (bb.get() == 0.toByte) {
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.sparse.add(bb.getLong()); i += 1 }
    } else {
      buf.dense = new Array[Byte](buf.m)
      bb.get(buf.dense)
      buf.sparse = null
    }
    buf
  }

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
}
