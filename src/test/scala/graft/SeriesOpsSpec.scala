package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.SeriesOps

class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("assemble sorts by ts and keeps columns aligned (J1/F5)") {
    val long = Seq(
      (1L, ts(30), 3.0, "c"), (1L, ts(10), 1.0, "a"), (1L, ts(20), 2.0, "b"),
      (2L, ts(5), 9.0, "z"))
      .toDF("k", "t", "v", "s")
    val out = SeriesOps.assemble(long, $"k", $"t", "v" -> $"v", "s" -> $"s")
      .orderBy($"series_key").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("v") == Seq(1.0, 2.0, 3.0))
    assert(out(0).getAs[scala.collection.Seq[String]]("s") == Seq("a", "b", "c"))
    assert(out(0).getAs[Long]("series_len") == 3L)
    assert(out(1).getAs[scala.collection.Seq[Double]]("v") == Seq(9.0))
  }

  test("sessionize splits on gap > threshold") {
    val long = Seq(
      (1L, ts(0)), (1L, ts(100)), (1L, ts(2000)), (1L, ts(2100)), (2L, ts(0)))
      .toDF("k", "t")
    val out = SeriesOps.sessionize(long, $"k", $"t", 1000L)
      .orderBy($"k", $"t").collect()
    assert(out.map(_.getAs[Long]("session_id")).toSeq == Seq(1L, 1L, 2L, 2L, 1L))
  }

  test("asofJoin picks latest right row at-or-before left ts") {
    val left = Seq((1L, ts(10), "L1"), (1L, ts(25), "L2"), (1L, ts(5), "L0"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 100.0), (1L, ts(20), 200.0))
      .toDF("k", "t", "rv")
    val out = SeriesOps.asofJoin(left, right, "k", "t", Seq("rv"))
      .orderBy($"t").collect()
    // L0@5: nothing before → null; L1@10: equal ts visible → 100; L2@25 → 200
    assert(out(0).isNullAt(out(0).fieldIndex("asof_rv")))
    assert(out(1).getAs[Double]("asof_rv") == 100.0)
    assert(out(2).getAs[Double]("asof_rv") == 200.0)
  }

  test("resample buckets by unit") {
    val long = Seq((1L, ts(0), 1.0), (1L, ts(30), 3.0), (1L, ts(3700), 5.0))
      .toDF("k", "t", "v")
    val out = SeriesOps.resample(long, $"k", $"t", $"v", "hour")
      .orderBy($"bucket").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("avg_value") == 2.0)
    assert(out(1).getAs[Double]("sum_value") == 5.0)
  }
}
