package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational core: scans, filters, projections, joins, aggregations,
  * windows, set ops, histograms (SURVEY.md §2.3-§2.5, §2.7, §7 step 3).
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation) are broadcast — no shuffle;
  *  - fact-fact joins shuffle on their keys and rely on AQE for skew;
  *  - all aggregations are partial-aggregate-friendly (sum/count/avg/min/
  *    max), so map-side combine halves shuffle volume for free;
  *  - filters/projections are plain Catalyst expressions → pushed into
  *    the parquet scan (verified via .explain: PushedFilters/ReadSchema).
  */
object Relational {

  /** q01: TPC-H Q1-style pricing summary — groupBy agg over the biggest
    * fact table; partial aggregation makes the shuffle 6 rows wide. */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        // DECIMAL arithmetic for the discounted sum: price and
        // discount are exact 2-decimal values, so the true sum is an
        // exact multiple of 1e-4 and can sit exactly ON the 2-dp
        // rounding half-grid — double fold-order noise then lands the
        // two engines on opposite sides (the q71 failure class).
        // Exact decimal sums on both sides are boundary-free; the
        // final cast to double is of an already-rounded exact value.
        round(sum($"l_extendedprice".cast("decimal(18,4)") *
          (lit(BigDecimal(1)) - $"l_discount".cast("decimal(18,4)"))), 2)
          .cast("double").as("sum_disc_price"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |   (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
      |   AS sum_disc_price,
      | round(avg(l_quantity), 6) AS avg_qty,
      | round(avg(l_extendedprice), 4) AS avg_price,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: TPC-H Q6-style selective scan — every predicate pushes to
    * parquet; single-row result, zero-shuffle (partial agg + final). */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_discount".between(0.04, 0.08) && $"l_quantity" < 25)
      .agg(
        // decimal for the same structural-boundary reason as q01's
        // sum_disc_price (price·discount is exact at 1e-4)
        round(sum($"l_extendedprice".cast("decimal(18,4)") *
          $"l_discount".cast("decimal(18,4)")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q02Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |   CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      | count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 25""".stripMargin

  /** q03: star join — orders ⋈ customer (shuffle on custkey) ⋈ nation ⋈
    * region (both broadcast: dimension tables stay small at any SF). */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .join(customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  private val q03Sql =
    """SELECT r_name, n_name,
      | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q04: top-k — agg then global sort+limit; ties broken on the already-
    * rounded measure + key so both engines sort identically. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .join(customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"o_custkey".as("custkey"), $"c_name".as("name"),
        $"total_spend", $"n_orders")
      .orderBy($"total_spend".desc, $"custkey")
      .limit(10)
  }

  private val q04Sql =
    """SELECT o_custkey AS custkey, c_name AS name,
      | round(sum(o_totalprice), 2) AS total_spend, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey, c_name
      |ORDER BY total_spend DESC, custkey
      |LIMIT 10""".stripMargin

  /** q05: left-semi join (EXISTS) — F1's isin generalized to a key set
    * from another table; semi-join avoids materializing order columns. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .join(orders(s, dir).filter($"o_orderstatus" === "F"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }

  private val q05Sql =
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q06: left-anti join (NOT EXISTS) — customers with no finished order. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .join(orders(s, dir).filter($"o_orderstatus" === "F"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(avg($"c_acctbal"), 4).as("avg_acctbal"))
      .orderBy($"c_mktsegment")
  }

  private val q06Sql =
    """SELECT c_mktsegment, count(*) AS n_customers,
      | round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q07: distinct + multi-agg over the events stream table (A1/A7). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        round(sum($"value"), 2).as("total_value"),
        round(avg($"value"), 6).as("avg_value"))
      .orderBy($"event_type")
  }

  private val q07Sql =
    """SELECT event_type, count(*) AS n_events,
      | count(DISTINCT user_id) AS n_users,
      | round(sum(value), 2) AS total_value,
      | round(avg(value), 6) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q08: ranking window — top-3 events per user by value (W11);
    * single shuffle on user_id, rank computed within partitions. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"user_id", $"rn", $"event_id", $"value")
      .orderBy($"user_id", $"rn")
  }

  private val q08Sql =
    """SELECT user_id, rn, event_id, value FROM (
      | SELECT user_id, event_id, value,
      |  row_number() OVER (PARTITION BY user_id
      |                     ORDER BY value DESC, event_id) AS rn
      | FROM events) t
      |WHERE rn <= 3
      |ORDER BY user_id, rn""".stripMargin

  /** q09: hyperparameter grid (J5) — crossJoin of literal dimension
    * tables replaces itertools.product (`unsupervised.py:419-430`). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val models = Seq("T_CPC", "TS_CPC", "S_CPC").toDF("model")
    val cls = Seq("LogisticRegression", "ClassifierNN").toDF("classifier")
    val bs = Seq(64, 256, 1024).toDF("batch_size")
    val lrl = Seq(0.0001, 0.001).toDF("lrl")
    models.crossJoin(cls).crossJoin(bs).crossJoin(lrl)
      .withColumn("lr", round($"batch_size" / 1024.0 * $"lrl", 10))
      .withColumn("run_name",
        concat_ws("|", $"model", $"classifier", $"batch_size"))
      .orderBy($"model", $"classifier", $"batch_size", $"lrl")
  }

  private val q09Sql =
    """SELECT model, classifier, batch_size, lrl,
      | round(batch_size / 1024.0 * lrl, 10) AS lr,
      | model || '|' || classifier || '|' || batch_size AS run_name
      |FROM (VALUES ('T_CPC'), ('TS_CPC'), ('S_CPC')) m(model)
      |CROSS JOIN (VALUES ('LogisticRegression'), ('ClassifierNN')) c(classifier)
      |CROSS JOIN (VALUES (64), (256), (1024)) b(batch_size)
      |CROSS JOIN (VALUES (CAST(0.0001 AS DOUBLE)), (CAST(0.001 AS DOUBLE))) l(lrl)
      |ORDER BY model, classifier, batch_size, lrl""".stripMargin

  /** q10: set ops — union/intersect/except of user-id sets (§2.7). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val clickers = e.filter($"event_type" === "click").select($"user_id")
    val erroring = e.filter($"event_type" === "error").select($"user_id")
    def counted(df: DataFrame, op: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), $"n")
    counted(clickers.union(erroring).distinct(), "union")
      .union(counted(clickers.intersect(erroring), "intersect"))
      .union(counted(clickers.except(erroring), "except"))
      .orderBy($"op")
  }

  private val q10Sql =
    """SELECT * FROM (
      | SELECT 'union' AS op, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type='click'
      |  UNION SELECT user_id FROM events WHERE event_type='error') u
      | UNION ALL
      | SELECT 'intersect', count(*) FROM (
      |  SELECT user_id FROM events WHERE event_type='click'
      |  INTERSECT SELECT user_id FROM events WHERE event_type='error') i
      | UNION ALL
      | SELECT 'except', count(*) FROM (
      |  SELECT user_id FROM events WHERE event_type='click'
      |  EXCEPT SELECT user_id FROM events WHERE event_type='error') x
      |) t ORDER BY op""".stripMargin

  /** q11: equi-width histogram (A8) — fixed bucket width so the bucket
    * function needs no global min/max pass; single groupBy shuffle. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .withColumn("bucket",
        least(floor($"l_extendedprice" / 3500.0), lit(29L)).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        round(min($"l_extendedprice"), 2).as("lo"),
        round(max($"l_extendedprice"), 2).as("hi"))
      .orderBy($"bucket")
  }

  private val q11Sql =
    """SELECT CAST(least(floor(l_extendedprice / 3500.0), 29) AS INT) AS bucket,
      | count(*) AS n,
      | round(min(l_extendedprice), 2) AS lo,
      | round(max(l_extendedprice), 2) AS hi
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q12: string projections (P10) — concat_ws label building as in
    * `unsupervised.py:495`, plus broadcast dim join. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .join(broadcast(nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .select(
        $"c_custkey".as("custkey"),
        concat_ws(" | ", $"c_name", $"n_name", $"c_mktsegment").as("label"),
        upper(substring($"c_name", 1, 8)).as("prefix"),
        length($"c_name").as("name_len"))
      .orderBy($"custkey")
  }

  private val q12Sql =
    """SELECT c_custkey AS custkey,
      | concat_ws(' | ', c_name, n_name, c_mktsegment) AS label,
      | upper(substr(c_name, 1, 8)) AS prefix,
      | length(c_name) AS name_len
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY custkey""".stripMargin

  /** q13: hierarchical rollup — multi-level aggregation with grouping_id
    * (beyond the reference per §2.5 note; one shuffle, partial-agg
    * friendly like any groupBy). */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .join(broadcast(nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum($"c_acctbal"), 2).as("total_bal"),
        grouping_id().as("gid"))
      .orderBy($"gid", $"n_name", $"c_mktsegment")
  }

  private val q13Sql =
    """SELECT n_name, c_mktsegment, count(*) AS n,
      | round(sum(c_acctbal), 2) AS total_bal,
      | GROUPING_ID(n_name, c_mktsegment) AS gid
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, c_mktsegment)
      |ORDER BY gid, n_name, c_mktsegment""".stripMargin

  /** q171: full CUBE — the grouping-sets completion of q13's rollup
    * (every (event_type × day-of-week) marginal in ONE pass): the
    * 2-D summary panel a warehouse user expects from GROUP BY CUBE,
    * here over the q153 dow convention (0 = Sunday). Exact micro-unit
    * sums; leading the ORDER BY with grouping_id keeps every NULL
    * dimension constant within its sort group, so the engines'
    * opposite NULLS-FIRST/LAST defaults never compare (the q13
    * discipline). Same scale shape as any groupBy: Spark expands the
    * cube rows map-side and partially aggregates all four grouping
    * sets in one shuffle. */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .select($"event_type",
        (dayofweek($"ts") - 1).cast("long").as("dow"),
        round($"value" * 1e6, 0).cast("long").as("x6"))
      .cube($"event_type", $"dow")
      .agg(count(lit(1)).as("n"),
        (sum($"x6") / lit(1e6)).as("total_value"),
        grouping_id().as("gid"))
      .orderBy($"gid", $"event_type", $"dow")
  }

  private val q171Sql =
    """WITH e AS (
      | SELECT event_type,
      |  CAST(date_part('dow', ts) AS BIGINT) AS dow,
      |  CAST(round(value * 1000000, 0) AS BIGINT) AS x6
      | FROM events)
      |SELECT event_type, dow, count(*) AS n,
      | CAST(sum(x6) AS BIGINT) / 1000000.0 AS total_value,
      | GROUPING_ID(event_type, dow) AS gid
      |FROM e GROUP BY CUBE (event_type, dow)
      |ORDER BY gid, event_type, dow""".stripMargin

  /** q14: analytic window breadth (W11 family) — lag/lead deltas,
    * running totals, percent_rank/ntile over per-user event sequences. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, 0)
    events(s, dir)
      .withColumn("prev_delta",
        round($"value" - lag($"value", 1).over(w), 6))
      .withColumn("next_delta",
        round(lead($"value", 1).over(w) - $"value", 6))
      .withColumn("running_sum", round(sum($"value").over(wAll), 4))
      .withColumn("pct_rank", round(percent_rank().over(
        Window.partitionBy($"user_id").orderBy($"value", $"event_id")), 6))
      .withColumn("quartile", ntile(4).over(
        Window.partitionBy($"user_id").orderBy($"value", $"event_id")))
      .select($"user_id", $"event_id", $"prev_delta", $"next_delta",
        $"running_sum", $"pct_rank", $"quartile")
      .orderBy($"user_id", $"event_id")
  }

  private val q14Sql =
    """SELECT user_id, event_id,
      | round(value - lag(value) OVER w, 6) AS prev_delta,
      | round(lead(value) OVER w - value, 6) AS next_delta,
      | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
      |   AS running_sum,
      | round(percent_rank() OVER wv, 6) AS pct_rank,
      | ntile(4) OVER wv AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |       wv AS (PARTITION BY user_id ORDER BY value, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** q15: date/time function breadth (§2.8 — the engine adds real
    * TimestampType handling the index-as-time reference lacks). */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(
        year($"ts").as("y"),
        weekofyear($"ts").as("week"),
        dayofweek($"ts").as("dow"),
        hour($"ts").as("hr"))
      .agg(count(lit(1)).as("n"), round(avg($"value"), 6).as("avg_value"))
      .filter($"n" >= 3)
      .orderBy($"y", $"week", $"dow", $"hr")
  }

  private val q15Sql =
    """SELECT CAST(year(ts) AS INT) AS y,
      | CAST(weekofyear(ts) AS INT) AS week,
      | CAST(dayofweek(ts) AS INT) + 1 AS dow,
      | CAST(hour(ts) AS INT) AS hr,
      | count(*) AS n, round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3
      |ORDER BY y, week, dow, hr""".stripMargin

  /** q16: string function breadth (§2.8) — pad/split_part/translate/
    * initcap/edit distance (levenshtein powers fuzzy key matching). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .select(
        $"c_custkey".as("custkey"),
        lpad($"c_name", 22, "_").as("padded"),
        substring_index($"c_name", "#", -1).as("num_part"),
        translate($"c_mktsegment", "AEIOU", "aeiou").as("seg_tr"),
        initcap(lower($"c_mktsegment")).as("seg_cap"),
        levenshtein($"c_name", $"c_mktsegment").as("edit_dist"))
      .orderBy($"custkey")
  }

  private val q16Sql =
    """SELECT c_custkey AS custkey,
      | lpad(c_name, 22, '_') AS padded,
      | split_part(c_name, '#', 2) AS num_part,
      | translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      | concat(upper(substr(lower(c_mktsegment), 1, 1)),
      |        substr(lower(c_mktsegment), 2)) AS seg_cap,
      | levenshtein(c_name, c_mktsegment) AS edit_dist
      |FROM customer ORDER BY custkey""".stripMargin

  /** q17: TPC-H Q9-flavor — part ⋈ lineitem ⋈ supplier ⋈ nation profit
    * rollup by (nation, brand). Two broadcast dims (part filtered,
    * nation) + one fact-side shuffle join with supplier. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .join(broadcast(part(s, dir).filter($"p_size" <= 20)),
        $"l_partkey" === $"p_partkey")
      .join(supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")
          - $"l_quantity" * $"p_retailprice" * 0.8), 2).as("profit"),
        round(avg($"s_acctbal"), 4).as("avg_supp_bal"))
      .orderBy($"n_name", $"p_brand")
  }

  private val q17Sql =
    """SELECT n_name, p_brand, count(*) AS n_lines,
      | round(sum(l_extendedprice * (1.0 - l_discount)
      |   - l_quantity * p_retailprice * 0.8), 2) AS profit,
      | round(avg(s_acctbal), 4) AS avg_supp_bal
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size <= 20
      |GROUP BY n_name, p_brand
      |ORDER BY n_name, p_brand""".stripMargin

  /** q18: dataset profiler — per-column null/distinct/min/max/avg over
    * lineitem numerics (the first pass any 100-TB curation run makes;
    * single scan per column group, sketch-swappable per PERF.md). */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        round(min(col(c)), 4).as("min_v"),
        round(max(col(c)), 4).as("max_v"),
        round(avg(col(c)), 4).as("avg_v"))
        .select(lit(c).as("column_name"), $"n_rows", $"n_null",
          $"n_distinct", $"min_v", $"max_v", $"avg_v")
    }.reduce(_ union _).orderBy($"column_name")
  }

  private val q18Sql = {
    val per = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | round(min($c), 4) AS min_v, round(max($c), 4) AS max_v,
           | round(avg($c), 4) AS avg_v
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$per\n) t ORDER BY column_name"
  }

  /** q19: deterministic stratified sampling — ~20% per language via an
    * md5 hash threshold (the reproducible sampleBy a training-data
    * pipeline needs: same rows selected on every run and every engine). */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = documents(s, dir)
      .withColumn("keep",
        conv(substring(md5(concat(lit("s:"), $"doc_id")), 1, 8), 16, 10)
          .cast("long") % 100 < 20)
    d.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_sampled"),
        round(sum(when($"keep", 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("rate"))
      .orderBy($"lang")
  }

  private val q19Sql =
    """WITH d AS (
      | SELECT lang,
      |  CAST(concat('0x', substr(md5(concat('s:', CAST(doc_id AS VARCHAR))),
      |       1, 8)) AS BIGINT) % 100 < 20 AS keep
      | FROM documents)
      |SELECT lang, count(*) AS n_docs,
      | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      | round(sum(CASE WHEN keep THEN 1 ELSE 0 END)
      |   / CAST(count(*) AS DOUBLE), 6) AS rate
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** q49: correlation/covariance aggregates per group — the moment
    * statistics a feature-engineering pass computes (all single-pass,
    * partial-aggregate-friendly). */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_pop($"l_quantity", $"l_extendedprice"), 2)
          .as("covar_qty_price"),
        round(stddev_pop($"l_discount"), 6).as("stddev_discount"),
        round(var_samp($"l_tax"), 6).as("var_tax"))
      .orderBy($"l_returnflag")
  }

  private val q49Sql =
    """SELECT l_returnflag, count(*) AS n,
      | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      | round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qty_price,
      | round(stddev_pop(l_discount), 6) AS stddev_discount,
      | round(var_samp(l_tax), 6) AS var_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q111: RANGE (interval) JOIN via bin bucketing — the custom-operator
    * family the builder brief names alongside the as-of join (q24).
    * Points (lineitem ship events) match intervals (order fulfillment
    * windows `[o_orderdate, o_orderdate + 7 days)`) under a non-equi
    * containment predicate. Spark has no native range-join strategy, so
    * the naive form compiles to a nested-loop over the cross product —
    * O(N·M). The 100-TB-safe form used here BINS both sides on a 7-day
    * grid: an interval of length ≤ 7 days covers ≤ 2 bins (exploded),
    * a point lands in exactly 1, and containment can only hold inside
    * a shared bin — so the pair generation is a HASH join on bin_id
    * with the exact predicate as a post-filter (PlanShapeSpec locks
    * no-cartesian). The interval side is a fixed-SIZE md5 order sample
    * (both sides grow with sf over the SAME time span, so the matched
    * PAIR count is quadratic in sf — the full-side form measured 86 s
    * at sf0.1; the q50 lesson applies: bound the probe side, keep the
    * corpus side full, cost O(K·density) = O(N)). The oracle runs the
    * plain inequality join (DuckDB IEJoin) over the same sample. */
  private val RJ_K = 2000

  private def q111(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val sample = orders(s, dir).select($"o_orderkey")
      .withColumn("h", md5(concat(lit("q111:"), $"o_orderkey".cast("string"))))
      .orderBy($"h", $"o_orderkey").limit(RJ_K).select($"o_orderkey")
    // dates are midnight-aligned timestamps; day arithmetic is exact
    val iv = orders(s, dir).join(sample, "o_orderkey")
      .select($"o_orderpriority",
        datediff($"o_orderdate", epoch).as("start_day"))
      .withColumn("bin", explode(array_distinct(array(
        floor($"start_day" / 7), floor(($"start_day" + 6) / 7)))))
    val pt = lineitem(s, dir).select($"l_returnflag",
      datediff($"l_shipdate", epoch).as("ship_day"))
      .withColumn("bin", floor($"ship_day" / 7))
    pt.join(iv, Seq("bin"))
      .filter($"ship_day" >= $"start_day" && $"ship_day" < $"start_day" + 7)
      .groupBy($"o_orderpriority", $"l_returnflag")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"o_orderpriority", $"l_returnflag")
  }

  private lazy val q111Sql =
    s"""SELECT o_orderpriority, l_returnflag, count(*) AS n_pairs
      |FROM orders, lineitem
      |WHERE o_orderkey IN
      |  (SELECT o_orderkey FROM orders
      |   ORDER BY md5('q111:' || CAST(o_orderkey AS VARCHAR)), o_orderkey
      |   LIMIT $RJ_K)
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate < o_orderdate + INTERVAL 7 DAY
      |GROUP BY o_orderpriority, l_returnflag
      |ORDER BY o_orderpriority, l_returnflag""".stripMargin

  /** q120: FUNNEL analysis — the ordered-step conversion operator an
    * events warehouse runs constantly: per user, first `view`, then
    * first `click` within 24 h OF THAT VIEW, then first `purchase`
    * within 48 h of that click; per-stage user counts and mean lag
    * from the previous stage. Each stage is a filter + per-user min
    * aggregation joined to the previous stage's anchors — three
    * user-keyed shuffles, no window over raw events, no self-join
    * explosion; at 100 TB the event scan is pruned to (user_id,
    * event_type, ts) and each stage's anchor table is one row per
    * surviving user (monotonically shrinking). Window widths chosen
    * on the measured corpus (24 h/48 h → 150→60→37 at sf0.01) so the
    * funnel actually discriminates. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("vt"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"vt" && $"ts" <= $"vt" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("ct"), min($"vt").as("vt"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"ct" && $"ts" <= $"ct" + expr("INTERVAL 48 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("pt"), min($"ct").as("pct"))
    def lagMin(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (unix_micros(a) - unix_micros(b)) / lit(60000000.0)
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), $"n_users",
        lit(null).cast("double").as("avg_lag_min"))
    val s2 = c.select(lagMin($"ct", $"vt").as("lag"))
      .agg(count(lit(1)).as("n_users"),
        round(avg($"lag"), 4).as("avg_lag_min"))
      .select(lit("2_click").as("stage"), $"n_users", $"avg_lag_min")
    val s3 = p.select(lagMin($"pt", $"pct").as("lag"))
      .agg(count(lit(1)).as("n_users"),
        round(avg($"lag"), 4).as("avg_lag_min"))
      .select(lit("3_purchase").as("stage"), $"n_users", $"avg_lag_min")
    s1.union(s2).union(s3).orderBy($"stage")
  }

  private val q120Sql =
    """WITH v AS (
      | SELECT user_id, min(ts) AS vt FROM events
      | WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      | SELECT e.user_id, min(e.ts) AS ct, min(vt) AS vt
      | FROM events e JOIN v USING (user_id)
      | WHERE e.event_type = 'click' AND e.ts > vt
      |  AND e.ts <= vt + INTERVAL 24 HOUR
      | GROUP BY e.user_id),
      |p AS (
      | SELECT e.user_id, min(e.ts) AS pt, min(ct) AS pct
      | FROM events e JOIN c USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.ts > ct
      |  AND e.ts <= ct + INTERVAL 48 HOUR
      | GROUP BY e.user_id)
      |SELECT * FROM (
      | SELECT '1_view' AS stage, count(*) AS n_users,
      |  CAST(NULL AS DOUBLE) AS avg_lag_min FROM v
      | UNION ALL
      | SELECT '2_click', count(*),
      |  round(avg((epoch_us(ct) - epoch_us(vt)) / 60000000.0), 4) FROM c
      | UNION ALL
      | SELECT '3_purchase', count(*),
      |  round(avg((epoch_us(pt) - epoch_us(pct)) / 60000000.0), 4) FROM p)
      |ORDER BY stage""".stripMargin

  /** q121: COHORT RETENTION — the signup-week × weeks-since-signup
    * activity matrix, the second standard events-warehouse report
    * next to q120's funnel. Cohort = week of the user's first signup;
    * cell (cohort, k) = distinct users of that cohort active in week
    * k; retention = cell ÷ cohort's week-0 cell. Week arithmetic is
    * day-diff ÷ 7 over Monday-truncated dates on BOTH engines (both
    * ISO weeks), so the division is exact. Scale: one per-user min
    * (shuffle on user), one event↔cohort join (shuffle on user), one
    * distinct-count per cell — cells are (weeks × weeks), tiny, but
    * the exact countDistinct inside each cell re-shuffles every
    * (cell, user) pair; at 100 TB the standard swap is
    * `approx_count_distinct(user_id, 0.01)` (HLL++, one pass, no
    * expand), the same exact→sketch trade q79→q113 documents for
    * percentiles — retention ratios tolerate 1% rsd by design. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id", $"event_type", $"ts")
    val cohorts = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("first_signup"))
      .select($"user_id",
        date_trunc("week", $"first_signup").cast("date").as("cohort_week"))
    val cells = ev.join(cohorts, "user_id")
      .filter($"ts" >= $"cohort_week")
      .withColumn("wk",
        (datediff(date_trunc("week", $"ts").cast("date"), $"cohort_week")
          / 7).cast("long"))
      .groupBy($"cohort_week", $"wk")
      .agg(countDistinct($"user_id").as("n_users"))
    val base = cells.filter($"wk" === 0)
      .select($"cohort_week", $"n_users".as("n0"))
    cells.join(broadcast(base), "cohort_week")
      .withColumn("retention",
        round($"n_users".cast("double") / $"n0", 4))
      .select($"cohort_week", $"wk", $"n_users", $"retention")
      .orderBy($"cohort_week", $"wk")
  }

  private val q121Sql =
    """WITH s AS (
      | SELECT user_id,
      |  CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      | FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (
      | SELECT e.user_id, cohort_week,
      |  datediff('day', cohort_week,
      |    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS wk
      | FROM events e JOIN s USING (user_id)
      | WHERE e.ts >= cohort_week),
      |cell AS (
      | SELECT cohort_week, wk, count(DISTINCT user_id) AS n_users
      | FROM a GROUP BY cohort_week, wk),
      |base AS (SELECT cohort_week, n_users AS n0 FROM cell WHERE wk = 0)
      |SELECT c.cohort_week, c.wk, c.n_users,
      | round(CAST(c.n_users AS DOUBLE) / n0, 4) AS retention
      |FROM cell c JOIN base USING (cohort_week)
      |ORDER BY cohort_week, wk""".stripMargin

  /** q122: SESSION PATH TRANSITIONS — the event-type bigram (Markov
    * transition) matrix: for each user's time-ordered stream, count
    * consecutive (src → dst) event-type pairs and row-normalize into
    * transition probabilities. One window pass (lead over the per-user
    * ordering — the W11 machinery) + one groupBy on the 5×5 pair
    * space; the normalizing sum is a window over that tiny aggregate.
    * The (ts, event_id) tie-break makes the sequence, hence the
    * counts, engine-exact. */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = events(s, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("dst", lead($"event_type", 1).over(w))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src"), $"dst")
      .agg(count(lit(1)).as("n"))
    val ws = Window.partitionBy($"src")
    pairs
      .withColumn("p", round($"n".cast("double") / sum($"n").over(ws), 4))
      .select($"src", $"dst", $"n", $"p")
      .orderBy($"src", $"dst")
  }

  private val q122Sql =
    """WITH o AS (
      | SELECT user_id, event_type,
      |  lead(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS dst
      | FROM events),
      |pairs AS (
      | SELECT event_type AS src, dst, count(*) AS n
      | FROM o WHERE dst IS NOT NULL GROUP BY src, dst)
      |SELECT src, dst, n,
      | round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 4) AS p
      |FROM pairs ORDER BY src, dst""".stripMargin

  /** q136: DISTRIBUTION-DRIFT MONITOR — day-over-day Jensen-Shannon
    * divergence of the per-event-type value distribution, the
    * data-quality check a production training pipeline runs on every
    * ingest batch (drift in the feature distribution is the standard
    * silent-failure signal for both feature stores and training-data
    * freshness). Per (event_type, day): histogram event values into
    * fixed 25-unit buckets (exact integer cents // 2500, capped at 19
    * — all-integer bucketing, no float boundary risk), normalize, and
    * compare against the previous day's histogram with
    * JSD(P,Q) = KL(P||M)/2 + KL(Q||M)/2, M = (P+Q)/2 — bounded in
    * [0, ln 2], symmetric, defined even where supports differ (the
    * reason production monitors prefer it to raw KL). A day×type cell
    * flags when JSD > 0.06 (calibrated: ~14% of cells flag at test SF).
    *
    * JOIN-FREE pairing: instead of self-joining day d with day d−1,
    * each day's histogram is unioned in twice — once as (day, c_cur),
    * once shifted to (day+1, c_prev) — and re-aggregated; consecutive
    * days meet in the same group. At 100 TB the only full-data pass is
    * the first (type, day, bucket) count with map-side partials; all
    * downstream frames are |types|·|days|·|buckets| rows. ln noise is
    * ≤ 1 ulp per term over ≤ 20 fixed-weight terms, ~1e-15 against the
    * 6-dp rounding half-step (the q129 ln convention).
    *
    * Cite: events-stream monitoring surface (reference
    * `exercise provided.ipynb` daily-rollup cells); Lin 1991 (JSD). */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = events(s, dir)
      .select($"event_type",
        date_trunc("day", $"ts").cast("date").as("day"),
        least(floor(round($"value" * 100).cast("long") / 2500).cast("long"),
          lit(19L)).as("b"))
      .groupBy($"event_type", $"day", $"b")
      .agg(count(lit(1)).as("c"))
    val u = h.select($"event_type", $"day", $"b",
        $"c".as("c_cur"), lit(0L).as("c_prev"))
      .unionAll(h.select($"event_type", date_add($"day", 1).as("day"), $"b",
        lit(0L).as("c_cur"), $"c".as("c_prev")))
    val wDay = Window.partitionBy($"event_type", $"day")
    val g = u.groupBy($"event_type", $"day", $"b")
      .agg(sum($"c_cur").as("c_cur"), sum($"c_prev").as("c_prev"))
      .withColumn("n_cur", sum($"c_cur").over(wDay))
      .withColumn("n_prev", sum($"c_prev").over(wDay))
      .filter($"n_cur" > 0 && $"n_prev" > 0)
    val p = $"c_cur" / $"n_cur"
    val q = $"c_prev" / $"n_prev"
    val m = (p + q) / 2
    // NaN guard relies on `when` SHORT-CIRCUITING per row: on a
    // c_cur = 0 row the log(p/m) branch (log(0) = -Inf, 0·-Inf = NaN)
    // is never evaluated — CaseWhen only computes the branch it takes.
    // The 0-count side of a bucket contributes exactly 0 to JSD, which
    // is the limit value (x·ln x → 0); the DuckDB twin's CASE WHEN has
    // the same semantics, so the hash gate pins this.
    g.withColumn("term",
        when($"c_cur" > 0, lit(0.5) * p * log(p / m)).otherwise(0.0) +
          when($"c_prev" > 0, lit(0.5) * q * log(q / m)).otherwise(0.0))
      .groupBy($"event_type", $"day", $"n_prev", $"n_cur")
      .agg(round(sum($"term"), 6).as("jsd"))
      .withColumn("drift", ($"jsd" > 0.06).cast("int"))
      .select($"event_type", $"day", $"n_prev", $"n_cur", $"jsd", $"drift")
      .orderBy($"event_type", $"day")
  }

  private val q136Sql =
    """WITH e AS (
      | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  least(CAST(round(value * 100) AS BIGINT) // 2500, 19) AS b
      | FROM events),
      |h AS (SELECT event_type, day, b, CAST(count(*) AS BIGINT) AS c
      |      FROM e GROUP BY 1, 2, 3),
      |u AS (
      | SELECT event_type, day, b, c AS c_cur, 0 AS c_prev FROM h
      | UNION ALL
      | SELECT event_type, day + 1 AS day, b, 0 AS c_cur, c AS c_prev FROM h),
      |g AS (
      | SELECT event_type, day, b, CAST(sum(c_cur) AS BIGINT) AS c_cur,
      |  CAST(sum(c_prev) AS BIGINT) AS c_prev
      | FROM u GROUP BY 1, 2, 3),
      |w AS (
      | SELECT *,
      |  CAST(sum(c_cur) OVER (PARTITION BY event_type, day) AS BIGINT)
      |    AS n_cur,
      |  CAST(sum(c_prev) OVER (PARTITION BY event_type, day) AS BIGINT)
      |    AS n_prev
      | FROM g),
      |t AS (
      | SELECT event_type, day, n_cur, n_prev,
      |  CASE WHEN c_cur > 0 THEN 0.5 * (c_cur / n_cur) *
      |    ln((c_cur / n_cur) / ((c_cur / n_cur + c_prev / n_prev) / 2))
      |   ELSE 0 END
      |  + CASE WHEN c_prev > 0 THEN 0.5 * (c_prev / n_prev) *
      |    ln((c_prev / n_prev) / ((c_cur / n_cur + c_prev / n_prev) / 2))
      |   ELSE 0 END AS term
      | FROM w WHERE n_cur > 0 AND n_prev > 0)
      |SELECT event_type, day, n_prev, n_cur, round(sum(term), 6) AS jsd,
      | CAST(round(sum(term), 6) > 0.06 AS INT) AS drift
      |FROM t GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q171_cube", q171, Some(q171Sql),
      "GROUP BY CUBE over (event_type, dow): all four grouping sets in one pass"),
    Q("q136_drift_monitor", q136, Some(q136Sql),
      "day-over-day JSD drift monitor on value histograms per event type"),
    Q("q120_funnel", q120, Some(q120Sql),
      "ordered-step funnel: view→click(24h)→purchase(48h), counts + mean stage lag"),
    Q("q121_cohort_retention", q121, Some(q121Sql),
      "signup-week cohort × weeks-since retention matrix"),
    Q("q122_path_transitions", q122, Some(q122Sql),
      "event-type Markov transition matrix (bigram counts + row-normalized p)"),
    Q("q111_range_join", q111, Some(q111Sql),
      "binned interval join: points ⋈ 7-day windows, hash-keyed on the bin"),
    Q("q49_moments", q49, Some(q49Sql), "corr/covar/stddev/var per group"),
    Q("q18_profiler", q18, Some(q18Sql), "per-column dataset profiler"),
    Q("q19_stratified_sample", q19, Some(q19Sql), "deterministic stratified sample"),
    Q("q17_profit_rollup", q17, Some(q17Sql), "4-table profit join (part/supplier)"),
    Q("q14_analytic_windows", q14, Some(q14Sql), "lag/lead/ntile/percent_rank"),
    Q("q15_datetime_funcs", q15, Some(q15Sql), "calendar bucketing breadth"),
    Q("q16_string_funcs", q16, Some(q16Sql), "string function breadth"),
    Q("q13_rollup", q13, Some(q13Sql), "rollup + grouping_id multi-level agg"),
    Q("q01_pricing_summary", q01, Some(q01Sql), "TPC-H Q1-style agg (A2/A12)"),
    Q("q02_selective_scan", q02, Some(q02Sql), "pushdown filter + agg (F2)"),
    Q("q03_star_join", q03, Some(q03Sql), "fact⋈dim broadcast star join (J4)"),
    Q("q04_topk_customers", q04, Some(q04Sql), "agg + global top-k (§2.7)"),
    Q("q05_semi_join", q05, Some(q05Sql), "left-semi EXISTS (F1 generalized)"),
    Q("q06_anti_join", q06, Some(q06Sql), "left-anti NOT EXISTS"),
    Q("q07_event_type_stats", q07, Some(q07Sql), "distinct + multi-agg (A1/A7)"),
    Q("q08_window_topk", q08, Some(q08Sql), "ranking window per key (W11)"),
    Q("q09_param_grid", q09, Some(q09Sql), "crossJoin hyperparam grid (J5)"),
    Q("q10_set_ops", q10, Some(q10Sql), "union/intersect/except (§2.7)"),
    Q("q11_histogram", q11, Some(q11Sql), "equi-width histogram (A8)"),
    Q("q12_string_label", q12, Some(q12Sql), "string concat label (P10)"))
}
