package graft

import org.apache.spark.sql.functions._
import graft.api.{Example, SeriesApi}
import graft.ops.ScanAggregator

/** Typed Dataset boundary (§1.4) and the order-correct typed Aggregator
  * recurrence (§2.10 scan row). */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("Dataset[Example] round-trips the canonical series frame") {
    val ds = SeriesApi.examplesFromEvents(spark, sf)
    val first = ds.orderBy($"seriesId").head()
    assert(first.ibi.nonEmpty && first.ibi.length == first.acc.length)
    assert(first.label == 0 || first.label == 1)
    // typed transform keeps the Dataset surface
    val reps = SeriesApi.representations(ds)
    assert(reps.count() == ds.count())
    assert(reps.head()._3.isFinite)
  }

  test("EmaAgg sorts by (ord1, ord2) before folding — order-independent input") {
    val agg = new ScanAggregator.EmaAgg(0.1)
    val items = Seq(
      ScanAggregator.ScanIn(3, 0.0, 30.0),
      ScanAggregator.ScanIn(1, 0.0, 10.0),
      ScanAggregator.ScanIn(2, 0.0, 20.0))
    // arrival order scrambled; result must be the ts-ordered recurrence
    val b = items.foldLeft(agg.zero)(agg.reduce)
    val expected = ((10.0 * 0.9 + 20.0 * 0.1) * 0.9) + 30.0 * 0.1
    assert(approxEqual(agg.finish(b), expected, 1e-12))
    // merge in either order gives the same answer (partial aggregation)
    val (l, r) = items.splitAt(1)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    assert(approxEqual(agg.finish(agg.merge(bl, br)), expected, 1e-12))
    assert(approxEqual(agg.finish(agg.merge(br, bl)), expected, 1e-12))
  }

  test("emaUdaf equals the array-form emaLast in a real aggregation") {
    val df = Seq(
      (1L, 1L, 5.0), (1L, 2L, 15.0), (1L, 3L, 25.0),
      (2L, 1L, 100.0))
      .toDF("k", "t", "v")
    val viaAgg = df.groupBy($"k")
      .agg(ScanAggregator.emaUdaf(0.1)($"t", $"v", $"v").as("ema"))
      .orderBy($"k").collect().map(_.getDouble(1))
    val viaArray2 = df.groupBy($"k")
      .agg(sort_array(collect_list(struct($"t", $"v"))).as("s"))
      .select($"k", graft.ops.ArrayOps.emaLast($"s.v", 0.1).as("ema"))
      .orderBy($"k").collect().map(_.getDouble(1))
    viaAgg.zip(viaArray2).foreach { case (a, b) =>
      assert(approxEqual(a, b, 1e-12))
    }
  }
}
