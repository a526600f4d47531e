package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Time-series DIAGNOSTICS over the long-form events table — the
  * monitoring/EDA layer a time-series SSL practitioner runs before and
  * after training (the reference's domain is event series;
  * `exercise provided.ipynb` plots raw series and distributions before
  * any model is fit). Classical analyses, each spelled as
  * partial-aggregable scans + bounded windows so the plan shape
  * carries to 100 TB unchanged:
  *
  *  - q152 robust anomaly screen (median/MAD z-score, Iglewicz-Hoaglin)
  *  - q153 seasonal decomposition (trend / day-of-week / residual)
  *  - q154 autocorrelation function (lags 1,2,3,7 on the daily series)
  *  - q156 CUSUM changepoint (per-series max cumulative deviation)
  *  - q158 naive/seasonal-naive forecast backtest (the baseline pair)
  *  - q159 lead-lag cross-correlation scan over ordered type pairs
  *  - q161 Holt-Winters one-step forecast (the model q158 judges)
  *  - q164 Theil-Sen robust trend vs the OLS slope
  *
  * Scale notes shared by the family: the exact interpolated medians in
  * q152 follow q79's convention (swap `percentile` →
  * `graft_kll_quantiles` at 100 TB — same plan shape, sketch-mergeable,
  * q150 proves the sketch path under the same oracle); every window is
  * either bounded (7-tap trend) or keyed by a high-cardinality column
  * (user_id), never global; profile joins broadcast O(#types) rows.
  */
object TimeSeriesQueries {

  /** q152: ROBUST ANOMALY SCREEN — per-type median/MAD profile, then
    * every point scored with the Iglewicz-Hoaglin modified z-score
    * 0.6745·|x−med|/MAD and thresholded at 3.5. Median+MAD (not
    * mean+σ) because anomalies poison the moments they are screened
    * against — the robust pair has a 50% breakdown point. Three scans
    * of a 2-column projection (med → MAD → score), each one
    * partial-aggregable aggregation; the 5-row profile broadcasts.
    * z is rounded to 6 decimals on BOTH sides before the threshold
    * compare so the flag set is cross-engine deterministic.
    * MAD = 0 (≥50% of a type's values equal its median — constant or
    * heavily-tied series) would make every off-median point Inf and
    * the max NaN-prone; both engines instead emit NULL z for that
    * type (no anomaly call is honest — the robust scale is
    * degenerate), so n_anomalies counts 0 and max_abs_z is NULL,
    * identically on both sides. */
  /** median via the mergeable KLL sketch, interpolated lookup: in the
    * exact (untrimmed, n ≤ k) regime this is BIT-IDENTICAL to
    * `percentile(v, 0.5)` (KllSpec pin), so the gate hashes are those
    * of the exact median — and the SAME plan degrades to ~1% rank
    * error instead of a per-group full sort at 100 TB. This makes the
    * family's scale note (q79's "swap percentile → sketch") the
    * shipped path, not a comment. */
  private def kllMedian(s: SparkSession, v: org.apache.spark.sql.Column) =
    element_at(graft.expr.GraftFunctions.kllQuantilesCont(s,
      graft.expr.GraftFunctions.kllSketch(s, v, 8192), Seq(0.5)), 1)

  private def q152(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir).select($"event_type", $"value")
    val med = e.groupBy($"event_type")
      .agg(kllMedian(s, $"value").as("med0"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(kllMedian(s, abs($"value" - $"med0")).as("mad0"))
    val prof = med.join(mad, "event_type") // one row per event type
    e.join(broadcast(prof), "event_type")
      .withColumn("az",
        when($"mad0" === 0, lit(null).cast("double"))
          .otherwise(round(lit(0.6745) * abs($"value" - $"med0") / $"mad0", 6)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"az" > 3.5, 1L).otherwise(0L)).as("n_anomalies"),
        round(max($"az"), 4).as("max_abs_z"),
        round(min($"med0"), 6).as("med"),
        round(min($"mad0"), 6).as("mad"))
      .orderBy($"event_type")
  }

  private val q152Sql =
    """WITH med AS (
      | SELECT event_type, quantile_cont(value, 0.5) AS med0
      | FROM events GROUP BY event_type),
      |mad AS (
      | SELECT e.event_type,
      |  quantile_cont(abs(e.value - m.med0), 0.5) AS mad0
      | FROM events e JOIN med m USING (event_type)
      | GROUP BY e.event_type),
      |z AS (
      | SELECT e.event_type, m.med0, d.mad0,
      |  CASE WHEN d.mad0 = 0 THEN NULL
      |       ELSE round(0.6745 * abs(e.value - m.med0) / d.mad0, 6)
      |  END AS az
      | FROM events e JOIN med m USING (event_type)
      |   JOIN mad d USING (event_type))
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CASE WHEN az > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_anomalies,
      | round(max(az), 4) AS max_abs_z,
      | round(min(med0), 6) AS med,
      | round(min(mad0), 6) AS mad
      |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q153: SEASONAL DECOMPOSITION (STL-lite) — per-type daily means,
    * trend = centered 7-tap moving average (one bounded window per
    * type), detrended = daily − trend, seasonal index = mean detrended
    * per day-of-week, residual MAE after removing both. The classical
    * additive decomposition every monitoring dashboard draws. DOW
    * convention: 0 = Sunday (DuckDB `date_part('dow', …)`; Spark
    * `dayofweek` − 1).
    *
    * Determinism: after the first rounding, values are carried as
    * INTEGER MICRO-UNITS (×10⁶ longs), so every downstream numerator
    * (trend sum, seasonal sum, MAE deviations Σ|n·x−Σx|) is exact
    * order-independent integer arithmetic — both engines then divide
    * IDENTICAL integers, and even an exactly-representable .5 quotient
    * rounds the same way (ties away from zero in both). Plain double
    * averaging here measurably diverges: an n=4 day-of-week group hit
    * an exact half-micro tie and the engines rounded it apart.
    *
    * Two rounding rules this family obeys (both learned from measured
    * cross-engine divergence):
    *  - `round(x, 0)` on an integer-derived quotient is SAFE — a k.5
    *    tie is binary-representable and both engines send it away from
    *    zero;
    *  - `round(x, 6)` on such a quotient is NOT — integer division by
    *    small n lands on half-MICRO ties that binary doubles cannot
    *    represent, and Spark rounds the shortest-decimal rendering
    *    (BigDecimal.valueOf) while DuckDB rounds the binary value, so
    *    the engines split ~50/50 on every such tie. Final displayed
    *    quotients of exact integers are therefore emitted UNROUNDED:
    *    identical integers through the identical division sequence
    *    give bit-identical doubles on both sides. */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x6") / count(lit(1)), 0).cast("long").as("v6"))
    val w7 = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("trend6",
        round(sum($"v6").over(w7) / count($"v6").over(w7), 0)
          .cast("long"))
      .withColumn("detr6", $"v6" - $"trend6")
      .withColumn("dow", (dayofweek($"d") - 1).cast("long"))
    val wg = Window.partitionBy($"event_type", $"dow")
    det
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("s6", sum($"detr6").over(wg))
      .withColumn("dev", abs($"n" * $"detr6" - $"s6"))
      .groupBy($"event_type", $"dow")
      .agg(min($"n").as("n_days"),
        (min($"s6") / min($"n") / lit(1e6)).as("seasonal"),
        (sum($"dev") / (min($"n") * min($"n") * lit(1e6)))
          .as("resid_mae"))
      .orderBy($"event_type", $"dow")
  }

  private val q153Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  CAST(round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
      |       / count(*), 0) AS BIGINT) AS v6
      | FROM events GROUP BY event_type, d),
      |det AS (
      | SELECT event_type, d,
      |  v6 - CAST(round(sum(v6) OVER w / count(v6) OVER w, 0) AS BIGINT)
      |    AS detr6,
      |  date_part('dow', d) AS dow
      | FROM daily
      | WINDOW w AS (PARTITION BY event_type ORDER BY d
      |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |g AS (
      | SELECT event_type, dow, detr6,
      |  count(*) OVER wg AS n,
      |  sum(detr6) OVER wg AS s6
      | FROM det
      | WINDOW wg AS (PARTITION BY event_type, dow)),
      |dev AS (
      | SELECT event_type, dow, n, s6, abs(n * detr6 - s6) AS dev
      | FROM g)
      |SELECT event_type, dow, CAST(min(n) AS BIGINT) AS n_days,
      | min(s6) / min(n) / 1000000.0 AS seasonal,
      | sum(dev) / (min(n) * min(n) * 1000000.0) AS resid_mae
      |FROM dev GROUP BY event_type, dow
      |ORDER BY event_type, dow""".stripMargin

  /** q154: AUTOCORRELATION FUNCTION — Pearson correlation of the
    * per-type daily-mean series with itself at lags 1, 2, 3, 7 (the
    * weekly-seasonality diagnostic: a 7-lag spike confirms the q153
    * day-of-week component). Both engines compute the SAME closed form
    * from the same six sums — n, Σx, Σy, Σx², Σy², Σxy — rather than
    * their builtin `corr` (whose streaming co-moment accumulations are
    * implementation-ordered); the lag fan-out is a row-local `stack`,
    * so the whole query is one keyed window + one partial-aggregable
    * reduce.
    *
    * Determinism: the daily means are carried as integer MILLI-units
    * (the q153 discipline, at ×10³ so the squared sums keep int64
    * headroom), so all six sums and the closed form's numerator /
    * variance factors are EXACT order-independent int64 arithmetic;
    * only the final double cast → multiply → sqrt → divide touches
    * floats, on identical integers (identical IEEE results on both
    * engines — exactness of the cast is not required, only that both
    * sides cast the SAME integer). Pearson is scale-invariant, so the
    * milli factor cancels and no de-scaling division is needed.
    * Headroom: |v3| ≤ 10⁶ at |daily mean| ≤ 10³, so n·Σx² ≤ n²·10¹²
    * is int64-safe through ~3000 days per series — an 8-year daily
    * series; beyond that drop to centi-units (one constant). */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e3, 0).cast("long").as("x3"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x3") / count(lit(1)), 0).cast("long").as("v3"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"d")
    val lagged = daily.select($"event_type", $"v3",
      lag($"v3", 1).over(wOrd).as("l1"),
      lag($"v3", 2).over(wOrd).as("l2"),
      lag($"v3", 3).over(wOrd).as("l3"),
      lag($"v3", 7).over(wOrd).as("l7"))
    lagged
      .select($"event_type",
        expr("stack(4, 1L, l1, 2L, l2, 3L, l3, 7L, l7)")
          .as(Seq("lag", "xl")),
        $"v3")
      .filter($"xl".isNotNull)
      .groupBy($"event_type", $"lag")
      .agg(count(lit(1)).as("n"), sum($"v3").as("sx"), sum($"xl").as("sy"),
        sum($"v3" * $"v3").as("sxx"), sum($"xl" * $"xl").as("syy"),
        sum($"v3" * $"xl").as("sxy"))
      .select($"event_type", $"lag", $"n".as("n_pairs"),
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("acf"))
      .orderBy($"event_type", $"lag")
  }

  private val q154Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  CAST(round(sum(CAST(round(value * 1000, 0) AS BIGINT))
      |       / count(*), 0) AS BIGINT) AS v3
      | FROM events GROUP BY event_type, d),
      |lagged AS (
      | SELECT event_type, v3,
      |  lag(v3, 1) OVER w AS l1, lag(v3, 2) OVER w AS l2,
      |  lag(v3, 3) OVER w AS l3, lag(v3, 7) OVER w AS l7
      | FROM daily
      | WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |longf AS (
      | SELECT event_type, CAST(1 AS BIGINT) AS lag, v3, l1 AS xl FROM lagged
      | UNION ALL SELECT event_type, 2, v3, l2 FROM lagged
      | UNION ALL SELECT event_type, 3, v3, l3 FROM lagged
      | UNION ALL SELECT event_type, 7, v3, l7 FROM lagged),
      |agg AS (
      | SELECT event_type, lag, count(*) AS n,
      |  sum(v3) AS sx, sum(xl) AS sy,
      |  sum(v3 * v3) AS sxx, sum(xl * xl) AS syy, sum(v3 * xl) AS sxy
      | FROM longf WHERE xl IS NOT NULL GROUP BY event_type, lag)
      |SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
      | round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |   sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
      |FROM agg ORDER BY event_type, lag""".stripMargin

  /** q156: CUSUM CHANGEPOINT — per-user cumulative sum of deviations
    * from the series mean; the changepoint estimate is the position of
    * max |CUSUM| (Page's statistic, the standard single-changepoint
    * locator). Everything happens inside ONE user_id partition: the
    * mean and the partition max are unbounded windows over the key,
    * the cumsum is the ordered prefix window — one shuffle total, no
    * join, no collect; at 100 TB the key count scales the parallelism.
    * Determinism: values enter as integer micro-units and the scaled
    * identity  n·CUSUM_t = n·P_t − t·S  (P = prefix sum, S = series
    * total) keeps the WHOLE argmax compare in exact int64 arithmetic —
    * the float spelling measurably diverged (one sf0.1 series hit a
    * prefix-sum ulp at the rounding boundary). Ties break to the
    * EARLIEST position. Headroom: |n·P_t| ≤ n²·max|x|·10⁶, int64-safe
    * through ~10⁵ rows per series at |x| ≤ 10³ — beyond that drop to
    * 10⁴ sub-units (same spelling, one constant). The headroom is
    * ENFORCED, not just documented: a per-key n²·max|x6| bound check
    * is folded into cusn (coalesce(assert_true,0) — un-prunable, adds
    * an exact 0), so a series past the envelope raises instead of
    * silently wrapping Spark's non-ANSI int64 multiply into a wrong
    * changepoint; DuckDB needs no guard (HUGEINT sums + overflow
    * errors are its defaults). */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wAll = Window.partitionBy($"user_id")
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val c = events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .withColumn("s6", sum($"x6").over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("mxa", max(abs($"x6")).over(wAll))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("p6", sum($"x6")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      // |n·p6 − rn·s6| ≤ 2·n²·max|x6|: require n²·max|x6| ≤ 4.5e18
      .withColumn("hdrm",
        coalesce(assert_true(
          $"n".cast("double") * $"n".cast("double") * $"mxa".cast("double")
            <= lit(4.5e18),
          lit("q156: int64 CUSUM headroom exceeded — drop x6 to coarser " +
            "sub-units for series beyond ~1e5 rows at |x| <= 1e3"))
          .cast("long"), lit(0L)))
      .withColumn("cusn", abs($"n" * $"p6" - $"rn" * $"s6") + $"hdrm")
      .withColumn("mx", max($"cusn").over(wAll))
    c.filter($"cusn" === $"mx")
      .groupBy($"user_id")
      .agg(min($"n").as("n"),
        min($"rn").as("cp_t"),
        (min($"mx") / (min($"n") * lit(1e6))).as("max_cusum"),
        (min($"s6") / (min($"n") * lit(1e6))).as("mean_value"))
      .orderBy($"user_id")
  }

  private val q156Sql =
    """WITH base AS (
      | SELECT user_id, ts, event_id,
      |  CAST(round(value * 1000000, 0) AS BIGINT) AS x6
      | FROM events),
      |c AS (
      | SELECT user_id,
      |  sum(x6) OVER (PARTITION BY user_id) AS s6,
      |  count(*) OVER (PARTITION BY user_id) AS n,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  sum(x6) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS p6
      | FROM base
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |m AS (
      | SELECT user_id, n, rn, s6,
      |  abs(n * p6 - rn * s6) AS cusn,
      |  max(abs(n * p6 - rn * s6)) OVER (PARTITION BY user_id) AS mx
      | FROM c)
      |SELECT user_id, CAST(min(n) AS BIGINT) AS n,
      | min(rn) AS cp_t,
      | min(mx) / (min(n) * 1000000.0) AS max_cusum,
      | min(s6) / (min(n) * 1000000.0) AS mean_value
      |FROM m WHERE cusn = mx
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q158: FORECAST BACKTEST — the "does the model beat naive" gate
    * every forecasting deployment runs before shipping: rolling
    * one-step-ahead NAIVE (yesterday's value) vs SEASONAL-NAIVE (the
    * value 7 days back — the q153/q154 weekly period) over a fixed
    * train/test split (test = days after min_day + 21d), reporting
    * per-type MAE of both and the skill ratio. Hyndman's standard
    * baseline pair; any real model must beat the better of the two.
    * Forecast errors are exact int64 micro-unit differences of the
    * lagged daily series, so both MAEs (and their ratio) are
    * cross-engine deterministic; one keyed window + one reduce. */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x6") / count(lit(1)), 0).cast("long").as("v6"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"d")
    val wAll = Window.partitionBy($"event_type")
    daily
      .withColumn("naive6", lag($"v6", 1).over(wOrd))
      .withColumn("snaive6", lag($"v6", 7).over(wOrd))
      .withColumn("cutoff", min($"d").over(wAll) + expr("INTERVAL 21 DAY"))
      .filter($"d" > $"cutoff" && $"snaive6".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_test"),
        sum(abs($"v6" - $"naive6")).as("en6"),
        sum(abs($"v6" - $"snaive6")).as("es6"))
      .select($"event_type", $"n_test",
        ($"en6" / ($"n_test" * lit(1e6))).as("mae_naive"),
        ($"es6" / ($"n_test" * lit(1e6))).as("mae_snaive"),
        ($"es6" / $"en6".cast("double")).as("skill"))
      .orderBy($"event_type")
  }

  private val q158Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  CAST(round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
      |       / count(*), 0) AS BIGINT) AS v6
      | FROM events GROUP BY event_type, d),
      |f AS (
      | SELECT event_type, d, v6,
      |  lag(v6, 1) OVER w AS naive6,
      |  lag(v6, 7) OVER w AS snaive6,
      |  min(d) OVER (PARTITION BY event_type) + INTERVAL 21 DAY
      |    AS cutoff
      | FROM daily
      | WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |t AS (
      | SELECT event_type,
      |  count(*) AS n_test,
      |  sum(abs(v6 - naive6)) AS en6,
      |  sum(abs(v6 - snaive6)) AS es6
      | FROM f WHERE d > cutoff AND snaive6 IS NOT NULL
      | GROUP BY event_type)
      |SELECT event_type, CAST(n_test AS BIGINT) AS n_test,
      | en6 / (n_test * 1000000.0) AS mae_naive,
      | es6 / (n_test * 1000000.0) AS mae_snaive,
      | es6 / CAST(en6 AS DOUBLE) AS skill
      |FROM t ORDER BY event_type""".stripMargin

  /** q159: CROSS-CORRELATION lead-lag scan — for every ORDERED pair of
    * event types, the Pearson correlation of A's daily series against
    * B's shifted by k ∈ [−3, 3] days: the "does type A lead type B"
    * diagnostic behind alerting correlation and causal triage. Spelled
    * as q154's closed form (same six sums, both engines compute
    * identical arithmetic — int64 MILLI-unit sums per q154's
    * determinism note, floats only in the final cast→sqrt→divide on
    * identical integers); the lag fan-out is a 7-row explode and the
    * pair join is day-keyed over the ALREADY-AGGREGATED daily table
    * (O(#types·#days) rows — broadcastable at any corpus scale, the
    * aggregate-then-join discipline that makes an all-pairs scan safe
    * at 100 TB). */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e3, 0).cast("long").as("x3"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x3") / count(lit(1)), 0).cast("long").as("v3"))
    val a = daily.select($"event_type".as("type_a"), $"d", $"v3".as("va"))
      .withColumn("lag", explode(array((-3 to 3).map(lit(_)): _*)))
      .withColumn("d_b", $"d" + make_dt_interval(days = $"lag"))
    val b = daily.select($"event_type".as("type_b"),
      $"d".as("d_b"), $"v3".as("vb"))
    a.join(broadcast(b), "d_b")
      .groupBy($"type_a", $"type_b", $"lag".cast("long").as("lag"))
      .agg(count(lit(1)).as("n"), sum($"va").as("sx"), sum($"vb").as("sy"),
        sum($"va" * $"va").as("sxx"), sum($"vb" * $"vb").as("syy"),
        sum($"va" * $"vb").as("sxy"))
      .select($"type_a", $"type_b", $"lag", $"n".as("n_pairs"),
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("ccf"))
      .orderBy($"type_a", $"type_b", $"lag")
  }

  private val q159Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  CAST(round(sum(CAST(round(value * 1000, 0) AS BIGINT))
      |       / count(*), 0) AS BIGINT) AS v3
      | FROM events GROUP BY event_type, d),
      |lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
      |a AS (
      | SELECT event_type AS type_a, d, v3 AS va, lag,
      |  d + to_days(CAST(lag AS INT)) AS d_b
      | FROM daily, lags),
      |j AS (
      | SELECT a.type_a, b.event_type AS type_b, a.lag, a.va, b.v3 AS vb
      | FROM a JOIN daily b ON a.d_b = b.d),
      |agg AS (
      | SELECT type_a, type_b, lag, count(*) AS n,
      |  sum(va) AS sx, sum(vb) AS sy,
      |  sum(va * va) AS sxx, sum(vb * vb) AS syy, sum(va * vb) AS sxy
      | FROM j GROUP BY type_a, type_b, lag)
      |SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
      | CAST(n AS BIGINT) AS n_pairs,
      | round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |   sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS ccf
      |FROM agg ORDER BY type_a, type_b, lag""".stripMargin

  /** q161: HOLT-WINTERS ONE-STEP FORECAST under the full oracle — the
    * actual MODEL the q158 beat-naive gate exists to judge. Additive
    * triple exponential smoothing (level + trend + period-7 seasonal;
    * Holt 1957 / Winters 1960, the Hyndman fpp2 ch. 7.3 recurrences)
    * over each type's daily series, backtested one-step-ahead on the
    * same test segment as q158 (entries past day 21), reporting HW MAE
    * next to the naive / seasonal-naive MAEs and both skill ratios.
    *
    * Spelling: the recurrence is a row-local `aggregate` fold over the
    * assembled daily array (the q82 emaScan discipline) carrying a
    * 10-slot state vector [l, b, s1..s7, errSum]; the oracle replays
    * the IDENTICAL fold with DuckDB `list_reduce`, seeded by making
    * the init state the first folded element (list_reduce has no init
    * parameter). Inside an ORDERED row-local fold the operation
    * sequence is pinned, so plain IEEE doubles are cross-engine
    * bit-deterministic (q82's precedent) — the inputs are the exact
    * int64 micro-unit daily means (q158's discipline), every
    * arithmetic step is spelled with identical shape/parenthesization
    * on both sides, and outputs go through the explicit
    * floor(x·10⁴+0.5)/10⁴ rounding both engines agree on.
    * Init (textbook): l₀ = mean(week 2), b₀ = (mean(w2) − mean(w1))/7,
    * sⱼ = ((vⱼ − m1) + (vⱼ₊₇ − m2))/2; α = 0.25, β = 0.125, γ = 0.25
    * (dyadic, exactly representable). Seasonal slot = (i−1) mod 7 —
    * position-based, so the fold is well-defined even on a gapped
    * spine (a production deployment gap-fills first; q87 is the
    * engine's gap-fill op).
    *
    * Scale: one partial-aggregable daily rollup (the only data
    * touch), then #types rows fold row-locally — O(days) per type,
    * zero shuffle after the rollup, the identical plan at 100 TB. */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val TrainN = 21
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x6") / count(lit(1)), 0).cast("long").as("v6"))
    val ser = daily.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"d", $"v6"))).as("dv"))
      .select($"event_type",
        transform($"dv", x => x("v6").cast("double")).as("v"),
        transform($"dv", x => x("v6")).as("v6arr"),
        size($"dv").as("n_days"))
      .filter($"n_days" >= 29)
    def el(i: Int) = element_at($"v", i)
    // left-assoc chains mirror the oracle's (v[1]+v[2]+...+v[7])/7.0
    val m1 = (el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7)) / lit(7.0)
    val m2 = (el(8) + el(9) + el(10) + el(11) + el(12) + el(13) + el(14)) / lit(7.0)
    val ini = ser
      .withColumn("m1", m1).withColumn("m2", m2)
      .withColumn("st0", concat(
        array($"m2", ($"m2" - $"m1") / lit(7.0)),
        transform(sequence(lit(1), lit(7)), j =>
          ((element_at($"v", j) - $"m1") +
            (element_at($"v", j + lit(7)) - $"m2")) / lit(2.0)),
        array(lit(0.0))))
    // the fold: state [l, b, s1..s7, errSum]; at each i the forecast
    // (l+b)+s_slot uses the INCOMING state, then l/b/s_slot update
    val fin = aggregate(sequence(lit(15), $"n_days"), $"st0",
      (acc, i) => {
        val slot = ((i - lit(1)) % lit(7)) + lit(1)
        val y = element_at($"v", i)
        val l = element_at(acc, lit(1))
        val b = element_at(acc, lit(2))
        val so = element_at(acc, slot + lit(2))
        val yhat = (l + b) + so
        val err = when(i > lit(TrainN), abs(y - yhat)).otherwise(lit(0.0))
        val lNew = lit(0.25) * (y - so) + lit(0.75) * (l + b)
        val bNew = lit(0.125) * (lNew - l) + lit(0.875) * b
        val sNew = lit(0.25) * (y - lNew) + lit(0.75) * so
        concat(array(lNew, bNew),
          transform(sequence(lit(1), lit(7)), j =>
            when(j === slot, sNew)
              .otherwise(element_at(acc, j + lit(2)))),
          array(element_at(acc, lit(10)) + err))
      })
    def lagSum(k: Int) =
      aggregate(sequence(lit(TrainN + 1), $"n_days"), lit(0L),
        (a, i) => a + abs(element_at($"v6arr", i) -
          element_at($"v6arr", i - lit(k))))
    ini
      .withColumn("fin", fin)
      .withColumn("en6", lagSum(1))
      .withColumn("es6", lagSum(7))
      .withColumn("n_test", ($"n_days" - lit(TrainN)).cast("long"))
      .select($"event_type", $"n_test",
        (floor(element_at($"fin", lit(10)) / ($"n_days" - lit(TrainN)) +
          lit(0.5)) / lit(1e6)).as("hw_mae"),
        ($"en6" / ($"n_test" * lit(1e6))).as("naive_mae"),
        ($"es6" / ($"n_test" * lit(1e6))).as("snaive_mae"),
        when($"en6" === 0, lit(null).cast("double"))
          .otherwise(floor(element_at($"fin", lit(10)) /
            $"en6".cast("double") * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("skill_vs_naive"),
        when($"es6" === 0, lit(null).cast("double"))
          .otherwise(floor(element_at($"fin", lit(10)) /
            $"es6".cast("double") * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("skill_vs_snaive"),
        (floor(element_at($"fin", lit(1)) / lit(100.0) + lit(0.5)) /
          lit(1e4)).as("level_end"),
        (floor(element_at($"fin", lit(2)) / lit(100.0) + lit(0.5)) /
          lit(1e4)).as("trend_end"))
      .orderBy($"event_type")
  }

  private val q161Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS d,
      |  CAST(round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
      |       / count(*), 0) AS BIGINT) AS v6
      | FROM events GROUP BY event_type, d),
      |ser AS (
      | SELECT event_type,
      |  list(CAST(v6 AS DOUBLE) ORDER BY d) AS v,
      |  list(v6 ORDER BY d) AS v6arr,
      |  count(*) AS n_days
      | FROM daily GROUP BY event_type HAVING count(*) >= 29),
      |ini AS (
      | SELECT *,
      |  (v[1]+v[2]+v[3]+v[4]+v[5]+v[6]+v[7]) / 7.0 AS m1,
      |  (v[8]+v[9]+v[10]+v[11]+v[12]+v[13]+v[14]) / 7.0 AS m2
      | FROM ser),
      |st AS (
      | SELECT *,
      |  list_concat(list_concat([m2, (m2 - m1) / 7.0],
      |    list_transform(generate_series(1, 7), j ->
      |      ((v[j] - m1) + (v[j + 7] - m2)) / 2.0)),
      |    [CAST(0 AS DOUBLE)]) AS st0
      | FROM ini),
      |hw AS (
      | SELECT *,
      |  list_reduce(
      |   list_concat([st0],
      |    list_transform(generate_series(15, CAST(n_days AS INT)), i ->
      |     [CAST(i AS DOUBLE), v[i], CAST(((i - 1) % 7) + 1 AS DOUBLE)])),
      |   (acc, x) -> list_concat(list_concat(
      |    [0.25 * (x[2] - acc[CAST(x[3] AS INT) + 2])
      |       + 0.75 * (acc[1] + acc[2]),
      |     0.125 * ((0.25 * (x[2] - acc[CAST(x[3] AS INT) + 2])
      |         + 0.75 * (acc[1] + acc[2])) - acc[1]) + 0.875 * acc[2]],
      |    list_transform(generate_series(1, 7), j ->
      |     CASE WHEN j = CAST(x[3] AS INT)
      |      THEN 0.25 * (x[2] - (0.25 * (x[2] - acc[CAST(x[3] AS INT) + 2])
      |             + 0.75 * (acc[1] + acc[2])))
      |           + 0.75 * acc[CAST(x[3] AS INT) + 2]
      |      ELSE acc[j + 2] END)),
      |    [acc[10] + CASE WHEN x[1] > 21
      |      THEN abs(x[2] - ((acc[1] + acc[2])
      |                       + acc[CAST(x[3] AS INT) + 2]))
      |      ELSE 0.0 END])) AS fin,
      |  CAST(list_sum(list_transform(
      |    generate_series(22, CAST(n_days AS INT)), i ->
      |     abs(v6arr[i] - v6arr[i - 1]))) AS BIGINT) AS en6,
      |  CAST(list_sum(list_transform(
      |    generate_series(22, CAST(n_days AS INT)), i ->
      |     abs(v6arr[i] - v6arr[i - 7]))) AS BIGINT) AS es6
      | FROM st)
      |SELECT event_type,
      | CAST(n_days - 21 AS BIGINT) AS n_test,
      | floor(fin[10] / (n_days - 21) + 0.5) / 1000000.0 AS hw_mae,
      | en6 / ((n_days - 21) * 1000000.0) AS naive_mae,
      | es6 / ((n_days - 21) * 1000000.0) AS snaive_mae,
      | CASE WHEN en6 = 0 THEN NULL
      |  ELSE floor(fin[10] / CAST(en6 AS DOUBLE) * 10000 + 0.5) / 10000.0
      |  END AS skill_vs_naive,
      | CASE WHEN es6 = 0 THEN NULL
      |  ELSE floor(fin[10] / CAST(es6 AS DOUBLE) * 10000 + 0.5) / 10000.0
      |  END AS skill_vs_snaive,
      | floor(fin[1] / 100.0 + 0.5) / 10000.0 AS level_end,
      | floor(fin[2] / 100.0 + 0.5) / 10000.0 AS trend_end
      |FROM hw ORDER BY event_type""".stripMargin

  /** q164: THEIL-SEN ROBUST TREND — the median of all pairwise slopes
    * (v_j − v_i)/(j − i) per event type, reported beside the OLS
    * least-squares slope it robustifies (Theil 1950 / Sen 1968;
    * 29.3% breakdown point vs OLS's zero — one corrupted day cannot
    * move it, the q152 robust-pair argument applied to trend).
    * Pairwise slopes are double quotients of EXACT int64 micro-unit
    * daily means over exact integer day gaps, so the slope multiset
    * is bit-identical cross-engine; the median uses the q79
    * percentile ↔ quantile_cont pairing, the OLS slope the q154
    * closed form (exact integer sums, one final division). Pair
    * generation is keyed by event_type over the ALREADY-AGGREGATED
    * daily table — O(#types · days²) with days bounded by the window,
    * the aggregate-then-join discipline (q159). */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .select($"event_type", $"ts",
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(round(sum($"x6") / count(lit(1)), 0).cast("long").as("v6"))
      .withColumn("i", row_number().over(
        Window.partitionBy($"event_type").orderBy($"d")))
    val a = daily.select($"event_type", $"i", $"v6".as("vi"))
    val b = daily.select($"event_type", $"i".as("j"), $"v6".as("vj"))
    val ts = a.join(b, Seq("event_type")).filter($"j" > $"i")
      .withColumn("slope", ($"vj" - $"vi").cast("double") / ($"j" - $"i"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        percentile($"slope", lit(0.5)).as("ts6"))
    val ols = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"i").as("sx"), sum($"v6").as("sy"),
        sum($"i" * $"v6").as("sxy"), sum($"i" * $"i").as("sxx"))
      .select($"event_type", $"n".as("n_days"),
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("ols6"))
    ts.join(ols, "event_type")
      .select($"event_type", $"n_days", $"n_pairs",
        (floor($"ts6" + 0.5) / lit(1e6)).as("ts_slope"),
        (floor($"ols6" + 0.5) / lit(1e6)).as("ols_slope"))
      .orderBy($"event_type")
  }

  private val q164Sql =
    """WITH daily AS (
      | SELECT event_type, d, v6,
      |  row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      | FROM (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |   CAST(round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
      |        / count(*), 0) AS BIGINT) AS v6
      |  FROM events GROUP BY event_type, date_trunc('day', ts))),
      |p AS (
      | SELECT a.event_type,
      |  CAST(b.v6 - a.v6 AS DOUBLE) / (b.i - a.i) AS slope
      | FROM daily a JOIN daily b
      |  ON a.event_type = b.event_type AND b.i > a.i),
      |ts AS (
      | SELECT event_type, count(*) AS n_pairs,
      |  quantile_cont(slope, 0.5) AS ts6
      | FROM p GROUP BY event_type),
      |ols AS (
      | SELECT event_type, n AS n_days,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS ols6
      | FROM (SELECT event_type, count(*) AS n, sum(i) AS sx,
      |        sum(v6) AS sy, sum(i * v6) AS sxy, sum(i * i) AS sxx
      |       FROM daily GROUP BY event_type))
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      | CAST(n_pairs AS BIGINT) AS n_pairs,
      | floor(ts6 + 0.5) / 1000000.0 AS ts_slope,
      | floor(ols6 + 0.5) / 1000000.0 AS ols_slope
      |FROM ts JOIN ols USING (event_type) ORDER BY event_type""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q164_theilsen_trend", q164, Some(q164Sql),
      "Theil-Sen median-of-pairwise-slopes robust trend vs the OLS slope"),
    Q("q161_holt_winters", q161, Some(q161Sql),
      "Holt-Winters additive one-step forecast backtest vs the naive pair"),
    Q("q158_forecast_backtest", q158, Some(q158Sql),
      "naive vs seasonal-naive rolling backtest: per-type MAE + skill ratio"),
    Q("q159_crosscorr", q159, Some(q159Sql),
      "lead-lag cross-correlation scan over all type pairs, lags -3..3"),
    Q("q152_robust_anomaly", q152, Some(q152Sql),
      "median/MAD modified-z anomaly screen per event type"),
    Q("q153_seasonal_decomp", q153, Some(q153Sql),
      "STL-lite trend / day-of-week / residual decomposition"),
    Q("q154_acf", q154, Some(q154Sql),
      "autocorrelation of daily series at lags 1,2,3,7 (closed form)"),
    Q("q156_cusum_changepoint", q156, Some(q156Sql),
      "per-series CUSUM changepoint locator (Page's statistic)"))
}
