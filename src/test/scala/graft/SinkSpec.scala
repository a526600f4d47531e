package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.ArrayOps

/** S4/S5 CSV sink + scan round-trip (the reference's results-table I/O,
  * `unsupervised.py:486-493`), metrics-append sink (S6 analogue), and
  * the P12 dropout projection. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("CSV sink → scan round-trip preserves the results table (S4/S5)") {
    val dir = tmpDir("graft_csv") + "/results"
    val results = Seq(
      (10, "T_CPC", "LogisticRegression", 1024, 0.8469),
      (7, "TS_CPC", "ClassifierNN", 1024, 0.8710))
      .toDF("n_Epochs", "Model", "Classification", "Batch Size", "ROC_AUC")
    results.coalesce(1).write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)
    assert(back.columns.toSeq ==
      Seq("n_Epochs", "Model", "Classification", "Batch Size", "ROC_AUC"))
    val rows = back.orderBy($"n_Epochs").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 7 && rows(0).getString(1) == "TS_CPC")
    assert(approxEqual(rows(1).getDouble(4), 0.8469))
  }

  test("metrics append sink accumulates across runs (S6 analogue)") {
    val dir = tmpDir("graft_metrics") + "/m"
    def log(run: Int, k: String, v: Double): Unit =
      Seq((run, k, v)).toDF("run", "metric", "value")
        .write.mode("append").parquet(dir)
    log(1, "loss", 1.989); log(1, "acc", 0.276); log(2, "loss", 0.197)
    val m = spark.read.parquet(dir)
    assert(m.count() == 3)
    assert(m.filter($"metric" === "loss").agg(min($"value"))
      .collect()(0).getDouble(0) == 0.197)
  }

  test("appendBatchIdempotent: a replayed micro-batch cannot double-append") {
    // foreachBatch is at-least-once: a task failure or restart can
    // re-deliver a batchId. The q108 sink keys each batch to its own
    // overwritten subdirectory, so replay must leave the sink EXACTLY
    // as one delivery would.
    val out = tmpDir("graft_idem") + "/sink"
    val sink = graft.streaming.Streaming.appendBatchIdempotent(out) _
    val b0 = Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "ema")
    val b1 = Seq((1L, 11.0)).toDF("user_id", "ema")
    sink(b0, 0L)
    sink(b1, 1L)
    sink(b1, 1L) // the retry
    val back = spark.read.parquet(out)
    assert(back.count() == 3, "replayed batch duplicated rows")
    // the batchId surfaces as a partition column readers may use or drop
    assert(back.columns.contains("batch"))
    assert(back.filter($"batch" === 1).count() == 1)
  }

  test("JSON and ORC sinks round-trip the series frame (source breadth)") {
    val base = tmpDir("graft_fmt")
    val df = Seq(
      (1L, Seq(1.0, 2.0), "en"), (2L, Seq(3.5), "fr"))
      .toDF("id", "vals", "lang")
    df.write.mode("overwrite").json(s"$base/j")
    val j = spark.read.json(s"$base/j")
    assert(j.count() == 2)
    assert(j.selectExpr("vals[0]").orderBy(col("id")).collect()(0).getDouble(0) == 1.0)
    df.write.mode("overwrite").orc(s"$base/o")
    val o = spark.read.orc(s"$base/o")
    assert(o.schema("vals").dataType.simpleString == "array<double>")
    assert(o.count() == 2)
  }

  test("dropout (P12): seeded mask, 1/(1-p) scaling, eval identity") {
    val xs = Seq.fill(2000)(1.0)
    val out = Seq(xs).toDF("a")
      .select(ArrayOps.dropout($"a", 0.1, seed = 7).as("d"))
      .collect()(0).getSeq[Double](0)
    // survivors scaled to 1/0.9; zeros ~10%
    assert(out.forall(v => v == 0.0 || approxEqual(v, 1.0 / 0.9)))
    val zeroFrac = out.count(_ == 0.0).toDouble / out.size
    assert(zeroFrac > 0.05 && zeroFrac < 0.15)
    // E[output] ≈ E[input] (the point of the 1/(1-p) rescale)
    assert(math.abs(out.sum / out.size - 1.0) < 0.05)
    // eval mode: identity
    val ev = Seq(Seq(1.0, 2.0)).toDF("a")
      .select(ArrayOps.dropout($"a", 0.1, 7, train = false).as("d"))
      .collect()(0).getSeq[Double](0)
    assert(ev == Seq(1.0, 2.0))
  }

  test("rand(seed) dropout is run-to-run deterministic under a pinned layout") {
    // the q102 no-oracle contract rests on rand(seed)'s draws depending
    // only on (seed, partition id, row order): pin the layout with a
    // hash repartition + within-partition sort and the kept-counts must
    // reproduce exactly across independent runs
    def once(): Seq[(Long, Long)] = {
      graft.ops.SeriesOps.assemble(
        graft.Tables.events(spark, "/root/testdata/sf0.001"),
          $"user_id", $"ts", "v" -> $"value")
        .repartition(4, $"series_key")
        .sortWithinPartitions($"series_key")
        .withColumn("m", ArrayOps.dropoutMask($"v", 0.2, seed = 123L))
        .select($"series_key",
          aggregate($"m", lit(0L), (s, m) => s + m.cast("long")).as("kept"))
        .orderBy($"series_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val a = once()
    assert(a.nonEmpty)
    assert(a == once(), "pinned-layout dropout draws did not reproduce")
  }

  test("q102: rand(seed) dropout query — rate ≈ p, rescale unbiased") {
    val rows = graft.queries.Registry.byName("q102_dropout_rand")
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Number]("n").longValue).sum
    val kept = rows.map(_.getAs[Number]("n_kept").longValue).sum
    val rate = 1.0 - kept.toDouble / n
    // p = 0.2 over ~60k timesteps: the empirical rate concentrates
    assert(rate > 0.17 && rate < 0.23, s"drop rate $rate far from 0.2")
    // 1/(1-p) rescale keeps the corpus-level mean unbiased
    val mo = rows.map(r => r.getAs[Number]("n").doubleValue * r.getAs[Double]("mean_orig")).sum / n
    val md = rows.map(r => r.getAs[Number]("n").doubleValue * r.getAs[Double]("mean_dropped")).sum / n
    assert(math.abs(md - mo) < math.abs(mo) * 0.1 + 0.05,
      s"rescaled mean drifted: $mo -> $md")
  }
}
