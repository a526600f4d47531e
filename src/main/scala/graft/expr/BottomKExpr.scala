package graft.expr

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native bottom-k sketch aggregate (guide tier: TypedImperativeAggregate
  * with a mutable, bounded buffer): keeps the k smallest DISTINCT 64-bit
  * hash values of a group. The buffer is O(k) regardless of group size —
  * the memory-bounded form of collect_set for sketching set similarity
  * between groups (bottom-k MinHash: Ĵ(A,B) =
  * |bottomk(A∪B) ∩ skA ∩ skB| / k), dedup coverage, and distinct-count
  * estimates (k / max_hash · 2⁶⁴). SQL name: graft_bottomk(x, k).
  */
case class BottomKAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType | LongType) =>
        val kv = kExpr.eval()
        // longValue, not intValue: a BIGINT k > Int.MaxValue must fail
        // here, not silently truncate into a tiny sketch
        if (kv == null || kv.asInstanceOf[Number].longValue() < 1 ||
            kv.asInstanceOf[Number].longValue() > Int.MaxValue)
          TypeCheckResult.TypeCheckFailure(
            s"graft_bottomk requires 1 <= k <= ${Int.MaxValue}, got $kv")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk requires (BIGINT, INT), got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
                      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[Long],
                     b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  private def add(buf: java.util.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    else if (v < buf.last()) { if (buf.add(v)) buf.pollLast() }
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
