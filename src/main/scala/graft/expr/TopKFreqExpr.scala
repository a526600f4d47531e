package graft.expr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SPACE-SAVING heavy-hitters aggregate (Metwally et al.'s
  * stream-summary; the same TypedImperativeAggregate tier as
  * `graft_bottomk`): tracks at most k (key, count, err) entries per
  * group in O(k) memory regardless of group size — the standard
  * vocabulary / hot-key / heavy-URL operator of a 100 TB corpus scan,
  * where an exact per-key groupBy count would shuffle the full key
  * universe. SQL name: graft_topk_freq(key, k) →
  * ARRAY<STRUCT<key STRING, cnt BIGINT, err BIGINT>>, sorted
  * (cnt DESC, key ASC).
  *
  * Guarantees (per summary): every key with true frequency > N/k is
  * present, and true ≤ cnt ≤ true + err (err = the evicted floor the
  * key inherited on insertion). Distributed merge is the rigorous
  * form: a key absent from a FULL summary may have occurred up to
  * that summary's min-count times, so merge adds the other side's
  * floor to both cnt and err before trimming back to the k largest —
  * the over-estimate invariant survives partial aggregation in any
  * partition order.
  *
  * The q113 exact-regime trick makes it ORACLE-GATEABLE: while a
  * group's distinct-key count stays ≤ k, no eviction ever fires in
  * any partial buffer, every err is 0, the merge degenerates to exact
  * count addition, and the output equals the exact groupBy counts —
  * which is what q125 hash-matches against DuckDB. TopKFreqSpec pins
  * the approximate regime (k ≪ distinct) on a planted Zipf stream:
  * heavy keys survive eviction pressure and the error bounds hold.
  */
case class TopKFreqAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType | LongType) =>
        val kv = kExpr.eval()
        if (kv == null || kv.asInstanceOf[Number].longValue() < 1 ||
            kv.asInstanceOf[Number].longValue() > 1000000)
          TypeCheckResult.TypeCheckFailure(
            s"graft_topk_freq requires 1 <= k <= 1000000, got $kv")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_freq requires (STRING, INT), got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  override def update(buf: java.util.HashMap[String, Array[Long]],
                      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) addOne(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  /** Space-Saving step: tracked → cnt += 1; room → insert (1, 0);
    * full → evict the min-cnt entry m (min key on cnt ties, for
    * determinism) and insert with (m.cnt + 1, err = m.cnt). */
  private def addOne(buf: java.util.HashMap[String, Array[Long]],
                     key: String): Unit = {
    val cur = buf.get(key)
    if (cur != null) cur(0) += 1L
    else if (buf.size < k) buf.put(key, Array(1L, 0L))
    else {
      val victim = minEntry(buf)
      val floor = victim.getValue()(0)
      buf.remove(victim.getKey)
      buf.put(key, Array(floor + 1L, floor))
    }
  }

  private def minEntry(buf: java.util.HashMap[String, Array[Long]])
      : java.util.Map.Entry[String, Array[Long]] = {
    var min: java.util.Map.Entry[String, Array[Long]] = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (min == null || e.getValue()(0) < min.getValue()(0) ||
          (e.getValue()(0) == min.getValue()(0) && e.getKey < min.getKey))
        min = e
    }
    min
  }

  /** floor a full summary imposes on absent keys: its min count
    * (0 while the summary still has room — nothing was ever evicted). */
  private def floorOf(buf: java.util.HashMap[String, Array[Long]]): Long =
    if (buf.size < k) 0L else minEntry(buf).getValue()(0)

  override def merge(b1: java.util.HashMap[String, Array[Long]],
                     b2: java.util.HashMap[String, Array[Long]])
      : java.util.HashMap[String, Array[Long]] = {
    val f1 = floorOf(b1)
    val f2 = floorOf(b2)
    // keys in both: counts add; keys only in b1: b2 may have seen them
    // up to f2 times (and vice versa) — add the floor to cnt AND err
    val merged = new java.util.HashMap[String, Array[Long]]()
    val it1 = b1.entrySet().iterator()
    while (it1.hasNext) {
      val e = it1.next()
      val o = b2.get(e.getKey)
      merged.put(e.getKey,
        if (o != null) Array(e.getValue()(0) + o(0), e.getValue()(1) + o(1))
        else Array(e.getValue()(0) + f2, e.getValue()(1) + f2))
    }
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      if (!b1.containsKey(e.getKey))
        merged.put(e.getKey, Array(e.getValue()(0) + f1, e.getValue()(1) + f1))
    }
    // trim back to the k largest (cnt desc, key asc — deterministic)
    if (merged.size <= k) merged
    else {
      val entries = new java.util.ArrayList(merged.entrySet())
      entries.sort { (a: java.util.Map.Entry[String, Array[Long]],
                      b: java.util.Map.Entry[String, Array[Long]]) =>
        val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      }
      val out = new java.util.HashMap[String, Array[Long]]()
      var i = 0
      while (i < k) {
        val e = entries.get(i)
        out.put(e.getKey, e.getValue)
        i += 1
      }
      out
    }
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, Array[Long]],
                    b: java.util.Map.Entry[String, Array[Long]]) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8),
        Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreqAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
