package graft

import org.apache.spark.sql.functions._
import graft.expr.{BottomKAgg, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.LongType

/** Native bottom-k sketch aggregate: bounded buffer, dedup, merge and
  * serde round-trips, SQL surface. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int) =
    BottomKAgg(BoundReference(0, LongType, nullable = true), Literal(k))

  test("buffer keeps the k smallest DISTINCT values") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    Seq(9L, 5L, 7L, 5L, 1L, 8L, 2L).foreach(v =>
      a.update(buf, InternalRow(v)))
    assert(a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(1L, 2L, 5L))
  }

  test("merge and serde preserve the sketch") {
    val a = agg(4)
    val b1 = a.createAggregationBuffer()
    val b2 = a.createAggregationBuffer()
    Seq(10L, 20L, 30L).foreach(v => a.update(b1, InternalRow(v)))
    Seq(5L, 25L, 20L).foreach(v => a.update(b2, InternalRow(v)))
    val roundTripped = a.deserialize(a.serialize(b2))
    val merged = a.merge(b1, roundTripped)
    assert(a.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(5L, 10L, 20L, 25L))
  }

  test("bottom-k Jaccard estimate tracks exact Jaccard (sketch math)") {
    val rnd = new scala.util.Random(31)
    val k = 256
    for (overlap <- Seq(0.2, 0.5, 0.8)) {
      // two sets of ~4000 hashed elements with the given overlap
      val common = Seq.fill((4000 * overlap).toInt)(rnd.nextLong().abs)
      val a = (common ++ Seq.fill(4000 - common.size)(rnd.nextLong().abs)).toSet
      val b = (common ++ Seq.fill(4000 - common.size)(rnd.nextLong().abs)).toSet
      val exact = (a & b).size.toDouble / (a | b).size
      val skA = a.toSeq.sorted.take(k).toSet
      val skB = b.toSeq.sorted.take(k).toSet
      val u = (skA | skB).toSeq.sorted.take(k).toSet
      val est = (u & skA & skB).size.toDouble / u.size
      assert(math.abs(est - exact) < 0.12,
        s"overlap=$overlap exact=$exact est=$est")
    }
  }

  test("SQL surface: groupBy sketch equals sorted-distinct prefix") {
    val df = (1 to 500).map(i => ((i % 3).toLong, ((i * 7919) % 997).toLong))
      .toDF("g", "h")
    val viaAgg = df.groupBy($"g")
      .agg(GraftFunctions.bottomK(spark, $"h", 10).as("sk"))
      .orderBy($"g").collect().map(_.getSeq[Long](1))
    val viaSort = df.groupBy($"g")
      .agg(slice(array_sort(collect_set($"h")), 1, 10).as("sk"))
      .orderBy($"g").collect().map(_.getSeq[Long](1))
    viaAgg.zip(viaSort).foreach { case (a, b) => assert(a == b) }
  }
}
