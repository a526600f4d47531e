package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Long-form ↔ array-form series plumbing and event-time operators
  * (SURVEY.md §1.4, §2.6, §2.10 extension surface).
  *
  * Scale notes: assembly is ONE shuffle on the series key with map-side
  * partial collect; sessionize/asof are single-window passes per key —
  * series are bounded (reference: len 200), so per-key state is O(len).
  */
object SeriesOps {

  /** Assemble array-form series from long form: one row per key with
    * time-sorted value arrays. `sort_array(collect_list(struct(ts, …)))`
    * gives deterministic intra-series order (ties broken by the extra
    * ord columns included in the struct). */
  def assemble(long: DataFrame, key: Column, ts: Column,
               values: (String, Column)*): DataFrame = {
    val struct_ = struct((ts.as("__ts") +: values.map { case (n, c) => c.as(n) }): _*)
    val sorted = sort_array(collect_list(struct_))
    val base = long.groupBy(key.as("series_key"))
      .agg(sorted.as("__series"), count(lit(1)).as("series_len"))
    values.foldLeft(base) { case (df, (n, _)) =>
      df.withColumn(n, col(s"__series.$n"))
    }.withColumn("ts_seq", col("__series.__ts")).drop("__series")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds` (§2.10). */
  def sessionize(long: DataFrame, key: Column, ts: Column,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    long
      .withColumn("__prev_ts", lag(ts, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(ts) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_session")
  }

  /** As-of join (union trick): for each left row, the most recent right
    * row with right.ts <= left.ts on the same key. Implemented as a
    * single sort within key partitions — union both sides, carry right
    * values forward with last(ignoreNulls) — no join explosion, one
    * shuffle, robust to skew via AQE. `rightVals` are columns of `right`
    * to carry; they appear as `asof_<name>`. */
  def asofJoin(left: DataFrame, right: DataFrame, keyName: String,
               tsName: String, rightVals: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__side", lit(1))
      .select(Seq(col(keyName), col(tsName), col("__side")) ++
        left.columns.filterNot(c => c == keyName || c == tsName)
          .map(c => col(c)) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rTagged = right.withColumn("__side", lit(0))
      .select(Seq(col(keyName), col(tsName), col("__side")) ++
        left.columns.filterNot(c => c == keyName || c == tsName)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal ts (side 0 < 1), so an
    // exactly-simultaneous right row IS visible to the left row (<=).
    val w = Window.partitionBy(col(keyName))
      .orderBy(col(tsName), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(lTagged.unionByName(rTagged)) {
      case (df, c) =>
        df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop((Seq("__side") ++ rightVals.map(c => s"__r_$c")): _*)
  }

  /** Tumbling-window resample on event time (batch analogue of
    * Structured Streaming's window(); §2.10). */
  def resample(long: DataFrame, key: Column, ts: Column, value: Column,
               unit: String): DataFrame =
    long.groupBy(key.as("series_key"), date_trunc(unit, ts).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(value).as("sum_value"),
        avg(value).as("avg_value"),
        min(value).as("min_value"),
        max(value).as("max_value"))
}
