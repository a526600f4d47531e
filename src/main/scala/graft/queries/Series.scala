package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.ops.{ArrayOps, SeriesOps}

/** Series / window / sequence operators over the long-form events table
  * (SURVEY.md §1.4 long↔array conversion, §2.6 W-ops, §2.10 extension).
  *
  * Queries deliberately exercise the ARRAY-form path (assemble → row-local
  * HOF) while their oracles are plain relational SQL — the DuckDB compare
  * then proves the array algebra equals the relational semantics.
  *
  * Ordering note: series assembly sorts by struct(ts, value…); every
  * oracle window therefore orders by (ts, <first value col>) to match.
  */
object Series {

  /** q20: long→array assembly round-trip — per-series stats computed FROM
    * the assembled arrays, checked against relational aggregation. */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val series = SeriesOps.assemble(events(s, dir), $"user_id", $"ts", "v" -> $"value")
    series.select(
      $"series_key".as("user_id"),
      $"series_len".as("n_events"),
      element_at($"ts_seq", 1).as("first_ts"),
      element_at($"ts_seq", -1).as("last_ts"),
      round(ArrayOps.arraySum($"v"), 4).as("total_value"),
      round(ArrayOps.arrayMean($"v"), 6).as("avg_value"),
      array_min($"v").as("min_value"),
      array_max($"v").as("max_value"))
      .orderBy($"user_id")
  }

  private val q20Sql =
    """SELECT user_id, count(*) AS n_events,
      | CAST(min(ts) AS TIMESTAMP) AS first_ts,
      | CAST(max(ts) AS TIMESTAMP) AS last_ts,
      | round(sum(value), 4) AS total_value,
      | round(avg(value), 6) AS avg_value,
      | min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q21: P1×P2 quality fuse via zip_with on assembled arrays; checksum
    * equals the relational weighted sum. */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
      .withColumn("quality", pmod($"event_id", lit(16)).cast("int"))
    val series = SeriesOps.assemble(e, $"user_id", $"ts",
      "v" -> $"value", "q" -> $"quality")
    series.select(
      $"series_key".as("user_id"),
      round(ArrayOps.arraySum(zip_with($"v", $"q",
        (v, q) => v * (q.cast("double") + 1.0) / 16.0)), 6).as("fused_sum"),
      $"series_len".as("n_events"))
      .orderBy($"user_id")
  }

  private val q21Sql =
    """SELECT user_id,
      | round(sum(value * ((event_id % 16) + 1.0) / 16.0), 6) AS fused_sum,
      | count(*) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q22: W7 EMA — sequential per-series recurrence via aggregate HOF;
    * oracle uses the closed form Σ α(1−α)^(n−i)·x_i. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val series = SeriesOps.assemble(events(s, dir), $"user_id", $"ts", "v" -> $"value")
    series.select(
      $"series_key".as("user_id"),
      round(ArrayOps.emaLast($"v", 0.1), 6).as("ema"),
      $"series_len".as("n_events"))
      .orderBy($"user_id")
  }

  private val q22Sql =
    """WITH ord AS (
      | SELECT user_id, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS n
      | FROM events)
      |SELECT user_id,
      | round(sum(CASE WHEN rn = 1 THEN pow(0.9, n - 1) * value
      |           ELSE 0.1 * pow(0.9, n - rn) * value END), 6) AS ema,
      | count(*) AS n_events
      |FROM ord GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q23: W1 long form — centered 3-row moving average as a Spark Window
    * (one shuffle on user_id; edges shrink like avg-of-available). */
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-1, 1)
    events(s, dir)
      .withColumn("smoothed", round(avg($"value").over(w), 6))
      .select($"user_id", $"event_id", $"value", $"smoothed")
      .orderBy($"user_id", $"event_id")
  }

  private val q23Sql =
    """SELECT user_id, event_id, value,
      | round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) AS smoothed
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** q24: as-of join — each click matched to the user's most recent
    * error at-or-before it. Spark side: union+carry-forward (one sort,
    * no join explosion); oracle: DuckDB's native ASOF JOIN. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")
    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"value".as("err_value"),
        unix_micros($"ts").as("err_us"))
    SeriesOps.asofJoin(clicks, errors, "user_id", "ts",
      Seq("err_value", "err_us"))
      .select($"user_id", $"event_id", $"value",
        $"asof_err_value".as("last_err_value"),
        (unix_micros($"ts") - $"asof_err_us").as("lag_us"))
      .orderBy($"user_id", $"event_id")
  }

  private val q24Sql =
    """SELECT l.user_id, l.event_id, l.value,
      | r.value AS last_err_value,
      | epoch_us(CAST(l.ts AS TIMESTAMP))
      |   - epoch_us(CAST(r.ts AS TIMESTAMP)) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.user_id, l.event_id""".stripMargin

  /** q25: gap-based sessionization (30-min gap) — per-user session count
    * and max/avg session sizes (§2.10 session_window analogue). */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sessions = SeriesOps.sessionize(events(s, dir), $"user_id", $"ts", 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("session_events"))
    sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max($"session_events").as("max_session_events"),
        round(avg($"session_events"), 6).as("avg_session_events"))
      .orderBy($"user_id")
  }

  private val q25Sql =
    """WITH o AS (
      | SELECT user_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      | FROM events),
      |f AS (
      | SELECT user_id, ts,
      |  CASE WHEN prev IS NULL
      |        OR date_part('epoch', CAST(ts AS TIMESTAMP))
      |         - date_part('epoch', CAST(prev AS TIMESTAMP)) > 1800
      |       THEN 1 ELSE 0 END AS new_s
      | FROM o),
      |sess AS (
      | SELECT user_id,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM f),
      |per AS (
      | SELECT user_id, session_id, count(*) AS session_events
      | FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions,
      | max(session_events) AS max_session_events,
      | round(avg(session_events), 6) AS avg_session_events
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q26: tumbling-window resample (daily × event_type) — the batch
    * analogue of Structured Streaming's window() aggregation. */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SeriesOps.resample(events(s, dir), $"event_type", $"ts", $"value", "day")
      .select($"series_key".as("event_type"), $"bucket".as("day"),
        $"n", round($"sum_value", 4).as("sum_value"),
        round($"avg_value", 6).as("avg_value"),
        $"min_value", $"max_value")
      .orderBy($"event_type", $"day")
  }

  private val q26Sql =
    """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      | count(*) AS n, round(sum(value), 4) AS sum_value,
      | round(avg(value), 6) AS avg_value,
      | min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** q27: per-key argmax (W8/A3 shape) — the event_type with the highest
    * total value per user; rank on the ROUNDED measure so both engines
    * agree on ties. */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val totals = events(s, dir)
      .groupBy($"user_id", $"event_type")
      .agg(round(sum($"value"), 6).as("total_value"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"total_value".desc, $"event_type")
    totals.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("top_type"), $"total_value")
      .orderBy($"user_id")
  }

  private val q27Sql =
    """SELECT user_id, event_type AS top_type, total_value FROM (
      | SELECT user_id, event_type,
      |  round(sum(value), 6) AS total_value,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY round(sum(value), 6) DESC, event_type) AS rn
      | FROM events GROUP BY user_id, event_type) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q28: numerically-stable log-sum-exp per series (A4/W9 kernel),
    * computed on the ARRAY form via the HOF library. */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val series = SeriesOps.assemble(
      events(s, dir).withColumn("x", $"value" / 100.0),
      $"user_id", $"ts", "x" -> $"x")
    series.select(
      $"series_key".as("user_id"),
      round(ArrayOps.logSumExp($"x"), 6).as("lse"),
      $"series_len".as("n_events"))
      .orderBy($"user_id")
  }

  private val q28Sql =
    """WITH m AS (
      | SELECT user_id, max(value / 100.0) AS mx FROM events GROUP BY user_id)
      |SELECT e.user_id,
      | round(ln(sum(exp(e.value / 100.0 - m.mx))) + any_value(m.mx), 6) AS lse,
      | count(*) AS n_events
      |FROM events e JOIN m USING (user_id)
      |GROUP BY e.user_id ORDER BY user_id""".stripMargin

  /** q29: pivot (long→wide) — per-user total value per event_type as
    * columns; Spark groupBy().pivot() vs oracle conditional aggregation. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum($"value"), 4))
      .na.fill(0.0)
      .orderBy($"user_id")
  }

  private val q29Sql =
    """SELECT user_id,
      | coalesce(round(sum(CASE WHEN event_type='click' THEN value END), 4), 0) AS click,
      | coalesce(round(sum(CASE WHEN event_type='error' THEN value END), 4), 0) AS error,
      | coalesce(round(sum(CASE WHEN event_type='purchase' THEN value END), 4), 0) AS purchase,
      | coalesce(round(sum(CASE WHEN event_type='signup' THEN value END), 4), 0) AS signup,
      | coalesce(round(sum(CASE WHEN event_type='view' THEN value END), 4), 0) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q94: P15 row-local softmax, oracle-checked — per-user activity
    * profile (q29's pivoted per-type sums, /1000 into exp range) turned
    * into a probability distribution via `ArrayOps.softmax` (stable
    * max-subtraction form; the identical left-associated sum of exps is
    * spelled out in the DuckDB oracle). */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val piv = events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(round(sum($"value"), 4))
      .na.fill(0.0)
    val arr = array(types.map(t => col(t) / 1000.0): _*)
    piv.withColumn("p", graft.ops.ArrayOps.softmax(arr))
      .select(($"user_id" +: types.zipWithIndex.map { case (t, i) =>
        round(element_at($"p", i + 1), 6).as(s"p_$t")
      }): _*)
      .orderBy($"user_id")
  }

  private val q94Sql =
    """WITH piv AS (
      | SELECT user_id,
      |  coalesce(round(sum(CASE WHEN event_type='click' THEN value END), 4), 0) / 1000.0 AS c,
      |  coalesce(round(sum(CASE WHEN event_type='error' THEN value END), 4), 0) / 1000.0 AS e,
      |  coalesce(round(sum(CASE WHEN event_type='purchase' THEN value END), 4), 0) / 1000.0 AS pu,
      |  coalesce(round(sum(CASE WHEN event_type='signup' THEN value END), 4), 0) / 1000.0 AS sg,
      |  coalesce(round(sum(CASE WHEN event_type='view' THEN value END), 4), 0) / 1000.0 AS vw
      | FROM events GROUP BY user_id),
      |mx AS (SELECT *, greatest(c, e, pu, sg, vw) AS m FROM piv),
      |z AS (SELECT *, exp(c - m) + exp(e - m) + exp(pu - m)
      |        + exp(sg - m) + exp(vw - m) AS zz FROM mx)
      |SELECT user_id,
      | round(exp(c - m) / zz, 6) AS p_click,
      | round(exp(e - m) / zz, 6) AS p_error,
      | round(exp(pu - m) / zz, 6) AS p_purchase,
      | round(exp(sg - m) / zz, 6) AS p_signup,
      | round(exp(vw - m) / zz, 6) AS p_view
      |FROM z ORDER BY user_id""".stripMargin

  /** q95: S4/S5 CSV sink + scan under the oracle gate — the results-CSV
    * round trip the reference performs (`unsupervised.py:486-493`:
    * `to_csv` then `read_csv` for plotting): write the per-type rollup
    * (rounded, so the decimal text round-trips exactly) to a CSV
    * results table, re-read it with header+inferSchema, and aggregate
    * the re-read frame. The ORACLE computes the same numbers straight
    * from parquet — any loss or mistyping in the sink/scan path breaks
    * the hash. */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withScratchDir("graft_q95") { scratch =>
      val rollup = events(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
        .agg(round(sum($"value"), 4).as("v"), count(lit(1)).as("n"))
      val out = scratch + "/results"
      rollup.coalesce(1).write.option("header", "true").csv(out)
      s.read.option("header", "true").option("inferSchema", "true").csv(out)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          round(sum($"v"), 4).as("total_v"),
          sum($"n").cast("long").as("total_n"))
        .orderBy($"event_type")
    }
  }

  private val q95Sql =
    """WITH rollup AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  round(sum(value), 4) AS v, count(*) AS n
      | FROM events GROUP BY event_type, d)
      |SELECT event_type, count(*) AS n_days,
      | round(sum(v), 4) AS total_v,
      | CAST(sum(n) AS BIGINT) AS total_n
      |FROM rollup GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q77: W2/W7 recurrence as a typed Aggregator over LONG form (no
    * array assembly) — order restored inside the aggregator's finish;
    * must equal q22's array-form EMA, and the same closed-form oracle. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ema = graft.ops.ScanAggregator.emaUdaf(0.1)
    events(s, dir)
      .groupBy($"user_id")
      .agg(
        round(ema(unix_micros($"ts"), $"value", $"value"), 6).as("ema"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  private val q77Sql =
    """WITH ord AS (
      | SELECT user_id, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS n
      | FROM events)
      |SELECT user_id,
      | round(sum(CASE WHEN rn = 1 THEN pow(0.9, n - 1) * value
      |           ELSE 0.1 * pow(0.9, n - rn) * value END), 6) AS ema,
      | count(*) AS n_events
      |FROM ord GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q78: SLIDING event-time windows (2-day window, 1-day slide) via
    * Spark's native window() — each event lands in win/slide buckets;
    * the oracle enumerates the same epoch-aligned window starts. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "2 days", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select($"w.start".as("win_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"win_start", $"event_type")
  }

  private val q78Sql =
    """WITH e AS (
      | SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      | FROM events),
      |win AS (
      | SELECT event_type, value,
      |  unnest(list_transform(
      |   generate_series(
      |     CAST(floor((t - 172800000000) / 86400000000.0) AS BIGINT) + 1,
      |     CAST(floor(t / 86400000000.0) AS BIGINT)),
      |   k -> k * 86400000000)) AS ws
      | FROM e)
      |SELECT make_timestamp(ws) AS win_start, event_type,
      | count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM win GROUP BY ws, event_type
      |ORDER BY win_start, event_type""".stripMargin

  /** q79: exact interpolated percentiles per event_type (the profiling
    * aggregation; at 100 TB swap in approx_percentile — same plan
    * shape, sketch-mergeable). */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(percentile($"value", array(lit(0.5), lit(0.9), lit(0.99)))
        .as("ps"), count(lit(1)).as("n"))
      .select($"event_type",
        round(element_at($"ps", 1), 6).as("p50"),
        round(element_at($"ps", 2), 6).as("p90"),
        round(element_at($"ps", 3), 6).as("p99"),
        $"n")
      .orderBy($"event_type")
  }

  private val q79Sql =
    """SELECT event_type,
      | round(quantile_cont(value, 0.5), 6) AS p50,
      | round(quantile_cont(value, 0.9), 6) AS p90,
      | round(quantile_cont(value, 0.99), 6) AS p99,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q113: the SKETCH scale path for q79's profiling stats, under the
    * oracle — PERF.md documents "percentiles swap to approx_percentile
    * sketches at scale (same plan shape)"; this entry proves it against
    * the exact oracle. Both sketches are EXACT in their small-data
    * regime, degrading gracefully at 100 TB: GK approx_percentile with
    * accuracy A has rank error ≤ n/A, i.e. exact while n < A per group
    * (A = 5e4 here — exact through sf0.1's ~20k rows/group; a
    * petabyte run accepts the ≤ n/A rank error or raises A — the GK
    * buffer is ONE opaque TypedImperativeAggregate attribute, so A is
    * a memory knob, not a plan-size knob). GK returns an ELEMENT (no
    * interpolation), so the oracle uses quantile_disc, not
    * quantile_cont. Spark's approx_count_distinct is NOT usable the
    * same way (its HLL++ buffer is one plan ATTRIBUTE per sketch
    * word — driving rsd low enough to hash-match explodes the plan to
    * ~100 MB task binaries, measured here); the engine ships its OWN
    * opaque-buffer HLL instead — `graft_hll_agg`, gated under q141 in
    * its sparse-exact regime. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(
        approx_percentile($"value", array(lit(0.5), lit(0.9), lit(0.99)),
          lit(50000)).as("ps"),
        count(lit(1)).as("n"))
      .select($"event_type",
        round(element_at($"ps", 1), 6).as("p50"),
        round(element_at($"ps", 2), 6).as("p90"),
        round(element_at($"ps", 3), 6).as("p99"),
        $"n")
      .orderBy($"event_type")
  }

  private val q113Sql =
    """SELECT event_type,
      | round(quantile_disc(value, 0.5), 6) AS p50,
      | round(quantile_disc(value, 0.9), 6) AS p90,
      | round(quantile_disc(value, 0.99), 6) AS p99,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q141: DISTINCT-COUNT SKETCHES under the full oracle — the native
    * `graft_hll_agg` (HllExpr) in its SPARSE-EXACT regime: every
    * grouped key here is bounded BY CONSTRUCTION below the 2^p
    * cutover (user buckets mod 512/2048, the ~30 distinct event
    * days), so the sketch returns the exact distinct count at every
    * SF and the gate is COUNT(DISTINCT) in DuckDB — the same
    * exact-regime trick as q113's GK percentiles. This closes the
    * documented approx_count_distinct exclusion (q113 note): the
    * sketch lives in ONE opaque buffer, so precision is a memory
    * knob, not a plan-size knob.
    *
    * Scale: exact countDistinct shuffles every (group, value) pair —
    * the dominant shuffle of a 100 TB profiling pass; the HLL form is
    * one-pass partial-aggregable (map tasks emit one small buffer per
    * group, reducers merge), and past the sparse regime it degrades
    * to ±1.04/√m estimation instead of failing (HllSpec pins dense
    * accuracy on planted cardinalities and partition-layout
    * independence in both regimes). */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expr.GraftFunctions
    events(s, dir)
      .groupBy($"event_type")
      .agg(
        GraftFunctions.hllDistinct(s, ($"user_id" % 512).cast("long"), 12)
          .as("nd_user_bucket"),
        GraftFunctions.hllDistinct(s, ($"user_id" % 2048).cast("long"), 12)
          .as("nd_user_wide"),
        GraftFunctions.hllDistinct(s, date_format($"ts", "yyyy-MM-dd"), 12)
          .as("nd_day"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  private val q141Sql =
    """SELECT event_type,
      | count(DISTINCT user_id % 512) AS nd_user_bucket,
      | count(DISTINCT user_id % 2048) AS nd_user_wide,
      | count(DISTINCT strftime(ts, '%Y-%m-%d')) AS nd_day,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q144: SKETCH ROLLUP under the oracle — the warehouse deployment
    * shape of the HLL surface: one small `graft_hll_sketch` blob per
    * (event_type, day) partition (what a 100 TB pipeline PERSISTS),
    * then the all-time distinct count answered by MERGING the stored
    * sketches (`graft_hll_merge` → `graft_hll_estimate`) — never by
    * rescanning raw events. Sparse blobs stay exact under union, so
    * the rolled-up estimate equals COUNT(DISTINCT) exactly in this
    * regime and the full hash gate applies; HllSpec pins the
    * merge-vs-direct equivalence generally.
    *
    * Scale: the daily layer shuffles (type, day)-keyed partial
    * buffers (≤ 8·2^p bytes each); the rollup layer moves ~30 blobs
    * per type. The raw-rescan spelling this replaces shuffles every
    * (type, user) pair of the whole history every time the question
    * is asked. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expr.GraftFunctions
    val daily = events(s, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(
        GraftFunctions.hllSketch(s, ($"user_id" % 512).cast("long"), 12)
          .as("sk"),
        count(lit(1)).as("n"))
    daily.groupBy($"event_type")
      .agg(
        GraftFunctions.hllEstimate(s,
          GraftFunctions.hllMerge(s, $"sk")).as("nd_user_bucket"),
        count(lit(1)).as("n_days"),
        sum($"n").as("n_events"))
      .orderBy($"event_type")
  }

  private val q144Sql =
    """SELECT event_type,
      | count(DISTINCT user_id % 512) AS nd_user_bucket,
      | count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
      | count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q145: RETENTION / AUDIENCE-OVERLAP via the KMV theta sketch — the
    * set-algebra question HLL structurally cannot answer: "of the users
    * active on day D, how many came back on D+1?" is a sketch
    * INTERSECTION. One `graft_kmv_sketch` blob per day (KmvExpr; k
    * smallest distinct hashes = a uniform sample of the id space),
    * consecutive-day pairs join the ~30-row daily table to itself, and
    * every dashboard number — actives, retained, new, churned, either —
    * reads from the two blobs (`graft_kmv_estimate` /
    * `graft_kmv_intersect` / `graft_kmv_union_est`).
    *
    * Gate regime: user buckets mod 512 are bounded BY CONSTRUCTION
    * below k = 1024 at every SF, so the sketches stay untrimmed (=
    * complete hash sets), every estimate is EXACT, and the oracle is
    * plain COUNT(DISTINCT) set algebra in DuckDB (the q141 exact-regime
    * trick). Past k the same plan degrades to ~1/√(k−2) relative error
    * (KmvSpec pins planted-cardinality accuracy both regimes).
    *
    * Scale story: exact retention is a self-join of (day, user)
    * distinct pairs — two full shuffles of the busiest fact table per
    * question, per day-pair. This plan aggregates the raw table ONCE
    * into ≤ 8k-byte daily blobs; the pair join moves ~30 rows; adding
    * a question (7-day retention, weekly overlap) re-joins blobs, not
    * raw history. Ref behavior: pandas set ops on collected frames
    * (`unsupervised.py:509` uniques); this is the 100 TB spelling. */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expr.GraftFunctions
    val daily = events(s, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(GraftFunctions.kmvSketch(s, ($"user_id" % 512).cast("long"), 1024)
        .as("sk"))
    val a = daily.select($"day", $"sk".as("sk_a"))
    val b = daily.select($"day".as("next_day"), $"sk".as("sk_b"))
    a.join(b, to_date($"next_day") === date_add(to_date($"day"), 1))
      .select($"day", $"next_day",
        GraftFunctions.kmvEstimate(s, $"sk_a").as("active_d"),
        GraftFunctions.kmvEstimate(s, $"sk_b").as("active_next"),
        GraftFunctions.kmvIntersect(s, $"sk_a", $"sk_b").as("retained"),
        GraftFunctions.kmvUnionEst(s, $"sk_a", $"sk_b").as("active_either"))
      .withColumn("new_users", $"active_next" - $"retained")
      .withColumn("retention_rate",
        floor($"retained" * 10000.0 / $"active_d" + 0.5) / 10000.0)
      .orderBy($"day")
  }

  private val q145Sql =
    """WITH du AS (
      |  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
      |         user_id % 512 AS ub
      |  FROM events),
      |d AS (SELECT day, count(*) AS active FROM du GROUP BY day),
      |pairs AS (
      |  SELECT a.day AS day, b.day AS next_day,
      |         a.active AS active_d, b.active AS active_next
      |  FROM d a JOIN d b
      |    ON CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY),
      |ret AS (
      |  SELECT a.day AS day, count(*) AS retained
      |  FROM du a JOIN du b ON a.ub = b.ub
      |   AND CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY
      |  GROUP BY a.day)
      |SELECT p.day, p.next_day, p.active_d, p.active_next,
      | COALESCE(r.retained, 0) AS retained,
      | p.active_d + p.active_next - COALESCE(r.retained, 0)
      |   AS active_either,
      | p.active_next - COALESCE(r.retained, 0) AS new_users,
      | floor(COALESCE(r.retained, 0) * 10000.0 / p.active_d + 0.5)
      |   / 10000.0 AS retention_rate
      |FROM pairs p LEFT JOIN ret r ON r.day = p.day
      |ORDER BY p.day""".stripMargin

  /** q149: Z-ORDER LAYOUT KEY under the oracle — the data-layout
    * primitive (`graft_zorder`, ZorderExpr) that makes 100 TB
    * multi-dimensional file skipping work: events mapped to an
    * 11-bit × 11-bit (user-bucket, value-bucket) grid, interleaved to
    * a Morton key, and rolled up per 64×64 TILE (z >> 12 — one right
    * shift strips the low 6 bits of BOTH dims at once). The per-tile
    * min/max columns ARE the point: they are the bounding boxes a
    * z-ordered file layout gives every file, and the gate pins them
    * tight (≤ 63 per dim by construction) — a 2-D range predicate
    * prunes tiles/files by box intersection instead of scanning
    * everything a 1-D sort leaves interleaved. ZorderSpec quantifies
    * the effect (chunked bounding-box audit, z-sort vs time-sort) and
    * pins bit-exactness of the interleave; the oracle reproduces the
    * magic-number dilation chain in pure SQL. */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expr.GraftFunctions
    val e = events(s, dir).select(
      ($"user_id" % 2048).as("x"),
      (floor($"value").cast("long") % 2048).as("y"))
    e.select($"x", $"y",
        GraftFunctions.zorder(s, $"x", $"y").as("z"))
      .groupBy(shiftright($"z", 12).as("tile"))
      .agg(count(lit(1)).as("n"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy($"tile")
  }

  private val q149Sql =
    """WITH e AS (
      | SELECT user_id % 2048 AS x,
      |        CAST(floor(value) AS BIGINT) % 2048 AS y
      | FROM events),
      |s1 AS (SELECT x, y,
      |  (x | (x << 16)) & 281470681808895 AS sx,
      |  (y | (y << 16)) & 281470681808895 AS sy FROM e),
      |s2 AS (SELECT x, y,
      |  (sx | (sx << 8)) & 71777214294589695 AS sx,
      |  (sy | (sy << 8)) & 71777214294589695 AS sy FROM s1),
      |s3 AS (SELECT x, y,
      |  (sx | (sx << 4)) & 1085102592571150095 AS sx,
      |  (sy | (sy << 4)) & 1085102592571150095 AS sy FROM s2),
      |s4 AS (SELECT x, y,
      |  (sx | (sx << 2)) & 3689348814741910323 AS sx,
      |  (sy | (sy << 2)) & 3689348814741910323 AS sy FROM s3),
      |s5 AS (SELECT x, y,
      |  (sx | (sx << 1)) & 6148914691236517205 AS sx,
      |  (sy | (sy << 1)) & 6148914691236517205 AS sy FROM s4),
      |z AS (SELECT x, y, sx | (sy << 1) AS zv FROM s5)
      |SELECT zv >> 12 AS tile, CAST(count(*) AS BIGINT) AS n,
      | min(x) AS min_x, max(x) AS max_x,
      | min(y) AS min_y, max(y) AS max_y
      |FROM z GROUP BY tile ORDER BY tile""".stripMargin

  /** q150: QUANTILE-SKETCH ROLLUP under the oracle — the last member
    * of the sketch warehouse (membership/distinct/sets/frequency →
    * now ORDER STATISTICS): one `graft_kll_sketch` blob of `value`
    * per (event_type, day) partition, all-time p50/p90/p99 answered
    * by MERGING the stored blobs (`graft_kll_merge` →
    * `graft_kll_quantiles`) — the only way "p99 this quarter" composes
    * at 100 TB, because percentiles are NOT partial-aggregable in
    * plain SQL (per-day percentiles cannot be combined; per-day
    * SKETCHES can). GK approx_percentile (q113) is one-shot — its
    * buffer is never stored or re-merged; this surface is.
    *
    * Gate regime: the deterministic 1-in-64 event sample keeps each
    * type's total value count below k = 16384 through sf3, so no
    * compactor ever fires, the merged level-0 multiset is complete,
    * and every quantile is EXACT under DuckDB's quantile_disc (whose
    * position convention — value at 0-based rank ⌈q·n⌉−1 — the
    * sketch reproduces bit-for-bit). Past k the same plan degrades to
    * ~1% rank error (KllSpec pins planted-distribution bounds). */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expr.GraftFunctions
    val daily = events(s, dir)
      .filter($"event_id" % 64 === 0)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(GraftFunctions.kllSketch(s, $"value", 16384).as("sk"),
        count(lit(1)).as("n"))
    daily.groupBy($"event_type")
      .agg(
        GraftFunctions.kllQuantiles(s,
          GraftFunctions.kllMerge(s, $"sk"),
          Seq(0.5, 0.9, 0.99)).as("qs"),
        sum($"n").as("n"))
      .select($"event_type",
        round(element_at($"qs", 1), 6).as("p50"),
        round(element_at($"qs", 2), 6).as("p90"),
        round(element_at($"qs", 3), 6).as("p99"),
        $"n")
      .orderBy($"event_type")
  }

  private val q150Sql =
    """SELECT event_type,
      | round(quantile_disc(value, 0.5), 6) AS p50,
      | round(quantile_disc(value, 0.9), 6) AS p90,
      | round(quantile_disc(value, 0.99), 6) AS p99,
      | CAST(count(*) AS BIGINT) AS n
      |FROM events WHERE event_id % 64 = 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q82: W7 EMA full TRAJECTORY (`exercise provided.ipynb` cell 20
    * curve smoothing) — emaScan HOF then posexplode back to long form;
    * oracle recomputes each prefix with the BIT-EXACT fold
    * (list_reduce with no init seeds from v₁ — the same left fold as
    * the HOF scan; the pow() closed form differs at rounding
    * boundaries). */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val series = SeriesOps.assemble(events(s, dir), $"user_id", $"ts",
      "v" -> $"value")
    series
      .select($"series_key".as("user_id"),
        posexplode(ArrayOps.emaScan($"v", 0.1)).as(Seq("t0", "ema")))
      // explicit floor(x·10⁴+0.5)/10⁴ on BOTH sides: round() boundary
      // semantics differ between engines on exact-half doubles
      .select($"user_id", ($"t0" + 1).as("t"),
        (floor($"ema" * 10000 + 0.5) / 10000.0).as("ema"))
      .orderBy($"user_id", $"t")
  }

  private val q82Sql =
    """WITH s1 AS (
      | SELECT user_id, list(value ORDER BY ts, value) AS v
      | FROM events GROUP BY user_id),
      |e AS (
      | SELECT user_id,
      |  unnest(generate_series(1, len(v))) AS t,
      |  unnest(list_transform(generate_series(1, len(v)), t2 ->
      |   floor(list_reduce(v[1:t2], (acc, x) -> acc * 0.9 + x * 0.1)
      |         * 10000 + 0.5) / 10000.0)) AS ema
      | FROM s1)
      |SELECT user_id, t, ema FROM e ORDER BY user_id, t""".stripMargin

  /** q85: time-RANGE (non-equi) join — error events within ±1 h of a
    * click by the same user (§2.4 "range join" gap as a feature). The
    * equi key (user_id) carries the shuffle; the range predicate
    * filters within the hash-join stream side, so this stays a hash
    * join, not a cartesian. */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("e_ts"), $"value".as("err_value"))
    clicks.join(errors, Seq("user_id"))
      .filter(abs(unix_micros($"e_ts") - unix_micros($"c_ts")) <= 3600000000L)
      .groupBy($"user_id")
      .agg(countDistinct($"click_id").as("clicks_with_nearby_error"),
        count(lit(1)).as("n_pairs"),
        round(avg($"err_value"), 6).as("avg_err_value"))
      .orderBy($"user_id")
  }

  private val q85Sql =
    """SELECT c.user_id,
      | count(DISTINCT c.event_id) AS clicks_with_nearby_error,
      | count(*) AS n_pairs,
      | round(avg(e.value), 6) AS avg_err_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id
      | AND abs(epoch_us(CAST(c.ts AS TIMESTAMP))
      |       - epoch_us(CAST(e.ts AS TIMESTAMP))) <= 3600000000
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** q86: Spark's NATIVE session_window in batch mode (30-min gap) —
    * must agree with the manual lag/cumsum sessionization (q25), which
    * is exactly what the oracle computes. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("session_events"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max($"session_events").as("max_session_events"))
      .orderBy($"user_id")
  }

  private val q86Sql =
    """WITH o AS (
      | SELECT user_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      | FROM events),
      |f AS (
      | SELECT user_id, ts,
      |  CASE WHEN prev IS NULL
      |        OR date_part('epoch', CAST(ts AS TIMESTAMP))
      |         - date_part('epoch', CAST(prev AS TIMESTAMP)) >= 1800
      |       THEN 1 ELSE 0 END AS new_s
      | FROM o),
      |sess AS (
      | SELECT user_id,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM f),
      |per AS (
      | SELECT user_id, session_id, count(*) AS session_events
      | FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions,
      | max(session_events) AS max_session_events
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q87: resample + GAP FILL — daily buckets per user over the user's
    * own [min_day, max_day] span, missing days forward-filled with the
    * last observed daily sum (the regularization step before any
    * fixed-step sequence model; irregular → regular grid). */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .groupBy($"user_id", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"value"), 4).as("v"))
    val spans = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
    val grid = spans.select($"user_id",
      explode(sequence($"d0", $"d1",
        expr("INTERVAL 1 DAY"))).as("d"))
    val w = Window.partitionBy($"user_id").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq("user_id", "d"), "left")
      .withColumn("filled", last($"v", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"),
        sum(when($"v".isNull, 1L).otherwise(0L)).as("n_gap_days"),
        round(sum($"filled"), 4).as("filled_sum"))
      .orderBy($"user_id")
  }

  private val q87Sql =
    """WITH daily AS (
      | SELECT user_id, date_trunc('day', ts) AS d,
      |  round(sum(value), 4) AS v
      | FROM events GROUP BY user_id, d),
      |grid AS (
      | SELECT user_id, unnest(generate_series(min(d), max(d),
      |   INTERVAL 1 DAY)) AS d
      | FROM daily GROUP BY user_id),
      |j AS (
      | SELECT g.user_id, g.d, daily.v,
      |  last_value(daily.v IGNORE NULLS) OVER (
      |   PARTITION BY g.user_id ORDER BY g.d
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      | FROM grid g LEFT JOIN daily
      |   ON g.user_id = daily.user_id AND g.d = daily.d)
      |SELECT user_id, count(*) AS n_days,
      | CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_gap_days,
      | round(sum(filled), 4) AS filled_sum
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q87_gap_fill", q87, Some(q87Sql), "resample + forward-fill gaps"),
    Q("q86_session_window", q86, Some(q86Sql), "native session_window (batch)"),
    Q("q85_range_join", q85, Some(q85Sql), "time-range non-equi join"),
    Q("q82_ema_curve", q82, Some(q82Sql), "W7 EMA trajectory vs closed form"),
    Q("q78_sliding_window", q78, Some(q78Sql), "sliding event-time windows"),
    Q("q79_percentiles", q79, Some(q79Sql), "exact interpolated percentiles"),
    Q("q141_hll_distinct", q141, Some(q141Sql),
      "native graft_hll_agg distinct-count sketch, sparse-exact regime under the oracle"),
    Q("q144_hll_rollup", q144, Some(q144Sql),
      "persisted per-day HLL sketches merged to all-time distinct counts (graft_hll_sketch/merge/estimate)"),
    Q("q145_kmv_retention", q145, Some(q145Sql),
      "day-over-day retention via KMV theta-sketch intersection (graft_kmv_*), exact-regime oracle"),
    Q("q149_zorder_tiles", q149, Some(q149Sql),
      "Morton/Z-order layout key (graft_zorder) tile rollup with bounding boxes, bit-exact SQL oracle"),
    Q("q150_kll_rollup", q150, Some(q150Sql),
      "mergeable quantile-sketch rollup (graft_kll_*): per-day blobs merged to all-time p50/p90/p99, exact regime"),
    Q("q113_sketch_stats", q113, Some(q113Sql),
      "GK approx_percentile: the sketch scale path, exact-regime oracle"),
    Q("q20_series_assembly", q20, Some(q20Sql), "long→array assembly + stats (§1.4)"),
    Q("q77_ema_aggregator", q77, Some(q77Sql),
      "W7 EMA via typed Aggregator on long form"),
    Q("q21_quality_fuse", q21, Some(q21Sql), "P1×P2 zip_with fuse checksum"),
    Q("q22_ema", q22, Some(q22Sql), "W7 EMA recurrence vs closed form"),
    Q("q23_smooth_window", q23, Some(q23Sql), "W1 long-form 3-tap window"),
    Q("q24_asof_join", q24, Some(q24Sql), "as-of join vs DuckDB ASOF"),
    Q("q25_sessionize", q25, Some(q25Sql), "gap sessionization (§2.10)"),
    Q("q26_resample_daily", q26, Some(q26Sql), "tumbling-window resample"),
    Q("q27_argmax_type", q27, Some(q27Sql), "per-key argmax (W8)"),
    Q("q28_logsumexp", q28, Some(q28Sql), "stable LSE on array form (A4/W9)"),
    Q("q29_pivot_types", q29, Some(q29Sql), "pivot long→wide"),
    Q("q94_softmax_profile", q94, Some(q94Sql),
      "P15 softmax over the per-type activity profile (oracle)"),
    Q("q95_csv_roundtrip", q95, Some(q95Sql),
      "S4/S5 results-CSV sink+scan round trip (oracle)"),
    Q("q99_metrics_sink", q99, Some(q99Sql),
      "S6 append-mode metrics-stream sink+scan round trip (oracle)"))

  /** q99: S6 metric-stream sink under the oracle gate — the
    * wandb-analogue append-only metrics log (`unsupervised.py:247-263`:
    * one `wandb.log({name: value})` batch per eval step). Each "epoch"
    * slice appends its per-type metric batch to ONE parquet metrics
    * table (append mode — the sink never rewrites earlier batches);
    * the query then re-reads the accumulated table and rolls it up.
    * The ORACLE computes the same rollup straight from `events` — any
    * loss, duplication, or mistyping in the append path breaks the
    * hash. Parquet appends are atomic per batch and the re-read is
    * schema-stable, so this is the streaming-metrics pattern a
    * 1000-executor training job would use (each epoch's executors
    * append partitioned files; readers see a consistent snapshot). */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withScratchDir("graft_q99") { scratch =>
      val out = scratch + "/metrics"
      // four eval steps, each appending its own metric batch (epoch =
      // a deterministic user_id slice, so batches are disjoint and the
      // oracle can reconstruct them)
      (0 to 3).foreach { e =>
        events(s, dir)
          .filter($"user_id" % 4 === e)
          .groupBy($"event_type")
          .agg(round(sum($"value"), 4).as("v"), count(lit(1)).as("n"))
          .select(lit(e).as("epoch"), $"event_type", $"v", $"n")
          .write.mode("append").parquet(out)
      }
      s.read.parquet(out)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_batches"),
          round(sum($"v"), 4).as("total_v"),
          sum($"n").cast("long").as("total_n"),
          round(max($"v"), 4).as("max_v"))
        .orderBy($"event_type")
    }
  }

  private lazy val q99Sql =
    """WITH batches AS (
      | SELECT user_id % 4 AS epoch, event_type,
      |  round(sum(value), 4) AS v, count(*) AS n
      | FROM events GROUP BY epoch, event_type)
      |SELECT event_type, count(*) AS n_batches,
      | round(sum(v), 4) AS total_v,
      | CAST(sum(n) AS BIGINT) AS total_n,
      | round(max(v), 4) AS max_v
      |FROM batches GROUP BY event_type ORDER BY event_type""".stripMargin
}
