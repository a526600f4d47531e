package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Semantic pins for the time-series diagnostics family (q152-q156):
  * each statistic is run over a PLANTED corpus whose ground truth is
  * known in closed form, so the assertions check the math, not just
  * execution. The cross-engine determinism of the integer-micro-unit
  * spellings is separately gated by the DuckDB oracles at two SFs. */
class TimeSeriesSpec extends SparkSpec {

  private def ts(hour: Int): Timestamp =
    Timestamp.from(Timestamp.valueOf("2024-03-01 00:00:00").toInstant
      .plusSeconds(hour * 3600L))

  /** write planted rows as <dir>/events.parquet in the testdata layout;
    * rows = (event_id, hour offset, user_id, event_type, value). */
  private def plant(name: String,
      rows: Seq[(Long, Int, Long, String, Double)]): String = {
    val dir = Scratch.tempDirDeletedOnExit(name)
    import spark.implicits._
    rows.map { case (id, h, u, t, v) => (id, ts(h), u, t, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q152 flags exactly the planted outliers with the textbook med/MAD") {
    // 10 copies of each value 0..20 (median 10, MAD 5) + 3 outliers of
    // 1000: inlier modified z ≤ 0.6745·10/5 = 1.349; outliers 133.55
    val inliers = for (v <- 0 to 20; k <- 0 until 10)
      yield ((v * 10 + k).toLong, v * 10 + k, 1L, "a", v.toDouble)
    val outliers = Seq((900L, 900, 1L, "a", 1000.0),
      (901L, 901, 1L, "a", 1000.0), (902L, 902, 1L, "a", 1000.0))
    val dir = plant("graft_ts_q152", inliers ++ outliers)
    val r = Registry.byName("q152_robust_anomaly").run(spark, dir)
      .collect().map(x => (x.getAs[String]("event_type"),
        x.getAs[Long]("n"), x.getAs[Long]("n_anomalies"),
        x.getAs[Double]("med"), x.getAs[Double]("mad")))
    assert(r.toSeq == Seq(("a", 213L, 3L, 10.0, 5.0)), r.toSeq.toString)
  }

  test("q154 reports ACF=1 at the planted period and q153 finds the peak day") {
    // one event per (type, day) for 70 days, value = 10 + (day % 7):
    // an exact period-7 sawtooth → lag-7 autocorrelation is exactly 1,
    // and the day-of-week seasonal argmax is the planted peak offset
    val rows = for (d <- 0 until 70) yield
      (d.toLong, d * 24, 1L, "a", 10.0 + (d % 7))
    val dir = plant("graft_ts_q15x", rows)

    val acf = Registry.byName("q154_acf").run(spark, dir)
      .collect().map(x => x.getAs[Long]("lag") -> x.getAs[Double]("acf"))
      .toMap
    assert(acf(7L) == 1.0, s"acf(7) = ${acf(7L)}")
    assert(acf(1L) < 1.0, s"acf(1) = ${acf(1L)}")

    // 2024-03-01 is a Friday (dow 5); day d has dow (5 + d) % 7 and
    // planted value 10 + (d % 7), so the peak value d%7 == 6 lands on
    // dow (5 + 6) % 7 = 4 — the seasonal argmax must find it
    val seas = Registry.byName("q153_seasonal_decomp").run(spark, dir)
      .collect().map(x => x.getAs[Long]("dow") ->
        x.getAs[Double]("seasonal")).toMap
    assert(seas.size == 7 && seas.maxBy(_._2)._1 == 4L, seas.toString)
  }

  test("q158 backtest: seasonal-naive is perfect on a period-7 series") {
    // value = 10 + (d % 7): snaive (lag 7) predicts exactly (MAE 0,
    // skill 0); naive (lag 1) errs |+1| on 6 of 7 days and |-6| at the
    // wrap. Test days 22..69 contain six wraps: MAE = (6·6+42)/48
    val rows = for (d <- 0 until 70) yield
      (d.toLong, d * 24, 1L, "a", 10.0 + (d % 7))
    val dir = plant("graft_ts_q158", rows)
    val r = Registry.byName("q158_forecast_backtest").run(spark, dir)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_test") == 48L, r.head.toString)
    assert(r.head.getAs[Double]("mae_naive") == 78.0 / 48, r.head.toString)
    assert(r.head.getAs[Double]("mae_snaive") == 0.0, r.head.toString)
    assert(r.head.getAs[Double]("skill") == 0.0, r.head.toString)
  }

  test("q159 finds the planted 2-day lead at exactly ccf=1") {
    // B(d) = A(d-2): pairing A(day) with B(day+2) reproduces A exactly,
    // so the cross-correlation at lag +2 must be exactly 1
    val rows = (for (d <- 0 until 70) yield
      (d.toLong, d * 24, 1L, "a", 10.0 + (d % 7))) ++
      (for (d <- 0 until 70) yield
        (100L + d, d * 24, 2L, "b", 10.0 + ((d + 5) % 7)))
    val dir = plant("graft_ts_q159", rows)
    val ccf = Registry.byName("q159_crosscorr").run(spark, dir)
      .collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b"),
        x.getAs[Long]("lag")) -> x.getAs[Double]("ccf")).toMap
    assert(ccf(("a", "b", 2L)) == 1.0, ccf.filter(_._1._1 == "a").toString)
    assert(ccf(("a", "a", 0L)) == 1.0)
    assert(ccf(("a", "b", 1L)) < 1.0)
  }

  test("q157 streamed anomaly rollup equals its Spark batch twin") {
    // engine-internal consistency (the DuckDB oracle is the
    // cross-engine gate): the watermarked streaming rollup must equal
    // the same profile + scoring + daily rollup computed in batch,
    // restricted to the watermark-finalized buckets
    import spark.implicits._
    val streamed = Registry.byName("q157_stream_anomaly").run(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(_.toString)

    val e = Tables.events(spark, sf).select($"event_type", $"ts", $"value")
    val med = e.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med0"))
    val prof = e.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(percentile(abs($"value" - $"med0"), lit(0.5)).as("mad0"))
      .join(med, "event_type")
    // ms floor, matching the watermark's millisecond resolution
    val mx = new Timestamp(
      e.agg(max($"ts")).collect().head.getTimestamp(0).getTime)
    val batch = e.join(broadcast(prof), "event_type")
      .withColumn("az",
        round(lit(0.6745) * abs($"value" - $"med0") / $"mad0", 6))
      .groupBy(date_trunc("day", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"az" > 3.5, 1L).otherwise(0L)).as("n_anomalies"),
        round(max($"az"), 4).as("max_abs_z"))
      .filter($"bucket" + expr("INTERVAL 1 DAY") <=
        lit(mx) - expr("INTERVAL 2 DAY"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(_.toString)

    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("q161 Holt-Winters beats naive on a planted trend+seasonal series") {
    // value = 100 + 0.5·d + 10·(d % 7): exactly the HW model class
    // (linear trend + additive period-7 seasonal). The textbook init
    // recovers b₀ = (m2 − m1)/7 = 0.5 EXACTLY and near-exact seasonal
    // indices, so one-step errors stay small; naive MAE on the test
    // days is ≈ (6·10.5 + 59.5)/7 ≈ 17.5 — HW must win decisively.
    val rows = for (d <- 0 until 30) yield
      (d.toLong, d * 24, 1L, "a", 100.0 + 0.5 * d + 10.0 * (d % 7))
    val dir = plant("graft_ts_q161", rows)
    val r = Registry.byName("q161_holt_winters").run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val hw = row.getAs[Double]("hw_mae")
    val nv = row.getAs[Double]("naive_mae")
    assert(row.getAs[Long]("n_test") == 9L, row.toString)
    assert(hw < nv / 4, s"hw_mae=$hw naive_mae=$nv — HW should dominate")
    assert(row.getAs[Double]("skill_vs_naive") < 0.25, row.toString)
    // the recovered trend must be near the planted slope (0.5 + the
    // 10/7 drift the sawtooth's weekly mean contributes ≈ unbiased
    // within the smoothing tolerance)
    val b = row.getAs[Double]("trend_end")
    assert(b > 0.0 && b < 2.0, s"trend_end=$b")
  }

  test("q166 streaming CUSUM alarms at the planted drift point") {
    // q156's corpus through the STREAMING monitor: 50×10 then 50×20,
    // all within the 7-day baseline window → μ0 = 15. After the step
    // S grows 5 units/event: alarm (h = 100) at event 50 + 21 = 71,
    // max excursion 50·5 = 250 — every number exact in int64 micro.
    val rows = for (i <- 0 until 100) yield
      (i.toLong, i, 7L, "a", if (i < 50) 10.0 else 20.0)
    val dir = plant("graft_ts_q166", rows)
    val r = Registry.byName("q166_stream_drift_cusum").run(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 100L, row.toString)
    assert(row.getAs[Double]("cusum_max") == 250.0, row.toString)
    assert(row.getAs[Long]("alarm_n") == 71L, row.toString)
  }

  test("q164 Theil-Sen shrugs off the outlier that drags OLS") {
    // perfect line 100 + 0.5·d with day 10 corrupted to 1000: only
    // 29/435 pairwise slopes touch the bad day, so the MEDIAN slope
    // stays exactly 0.5; the least-squares slope must move
    val rows = for (d <- 0 until 30) yield
      (d.toLong, d * 24, 1L, "a",
        if (d == 10) 1000.0 else 100.0 + 0.5 * d)
    val dir = plant("graft_ts_q164", rows)
    val r = Registry.byName("q164_theilsen_trend").run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_pairs") == 30L * 29 / 2, row.toString)
    assert(row.getAs[Double]("ts_slope") == 0.5, row.toString)
    assert(math.abs(row.getAs[Double]("ols_slope") - 0.5) > 0.1,
      s"OLS should be dragged by the outlier: ${row.toString}")
  }

  test("q156 locates the planted step change at its exact position") {
    // 50 values of 10 then 50 of 20: mean 15, |CUSUM| peaks at t=50
    // with value 50·|10−15| = 250
    val rows = for (i <- 0 until 100) yield
      (i.toLong, i, 7L, "a", if (i < 50) 10.0 else 20.0)
    val dir = plant("graft_ts_q156", rows)
    val r = Registry.byName("q156_cusum_changepoint").run(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("cp_t") == 50L, row.toString)
    assert(row.getAs[Double]("max_cusum") == 250.0, row.toString)
    assert(row.getAs[Double]("mean_value") == 15.0, row.toString)
  }
}
