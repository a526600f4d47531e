package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evaluation metrics as single-pass distributed aggregations
  * (SURVEY.md §2.5 A9-A11, §2.9).
  *
  * ROC-AUC uses the rank-sum (Mann-Whitney U) identity so it is both
  * oracle-checkable in ANSI SQL and computable without collecting scores:
  *   AUC = (Σ_{i: y=1} rank(s_i) − n⁺(n⁺+1)/2) / (n⁺ · n⁻)
  * with average ranks for ties. Scale note: ranks are computed on the
  * DISTINCT-score table (usually ≪ rows), and the UNGROUPED path
  * computes them with a two-phase bucketed cumsum (uniform score
  * buckets → per-bucket totals → exclusive bucket offsets via a tiny
  * triangular join, broadcast back → within-bucket window) — NO
  * unpartitioned window anywhere (PlanShapeSpec locks this), so a
  * global AUC over a high-cardinality score column never serializes
  * onto one task. The decomposition is the q131 prefix-sum trick
  * applied to ranks: bucket offsets are exact integer sums, so the
  * ranks — and the gated q60/q62 hashes — are bit-identical to the
  * one-window form.
  */
object Metrics {

  /** buckets of the ungrouped two-phase rank — offsets table is 1024
    * rows (broadcast), per-bucket sort is |distinct scores|/~1024. */
  private val RankBuckets = 1024

  /** ROC-AUC of `score` against binary `label` (0/1), optionally grouped
    * by `groupCols`. Returns groupCols + (auc, n_pos, n_neg). */
  def rocAuc(df: DataFrame, score: Column, label: Column,
             groupCols: Seq[Column] = Seq.empty): DataFrame = {
    val base = df.select((groupCols :+ score.as("s") :+
      label.cast("double").as("y")): _*)
    val gNames = base.columns.dropRight(2).toIndexedSeq
    val gCols = gNames.map(col)
    // per distinct score: row count and positive count
    val grouped = base.groupBy((gCols :+ col("s")): _*)
      .agg(count(lit(1)).as("c"), sum(col("y")).as("pos_c"))
    val withCum =
      if (gNames.nonEmpty) {
        val w = Window.partitionBy(gCols: _*)
          .orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
        grouped.withColumn("cum_before",
          coalesce(sum(col("c")).over(w), lit(0L)))
      } else {
        // ungrouped: bucket distinct scores into uniform [lo, hi]
        // ranges (width_bucket is monotone, and a tie group — one
        // distinct s — can never straddle buckets), so the global
        // cumsum decomposes into broadcast bucket offsets + a
        // PARTITIONED within-bucket window
        // bounds over REAL scores only: max() returns NaN when any is
        // present (NaN sorts above all doubles), and a NaN hi would
        // null every width_bucket below
        val mm = grouped.filter(!col("s").cast("double").isNaN)
          .agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        val withB = grouped.crossJoin(broadcast(mm))
          .withColumn("b",
            when(col("s").isNull, lit(0L)) // nulls sort first
              // NaN sorts after every double in Spark ordering — pin
              // it past the last real bucket, never a null bucket
              // (which would silently DROP the row at the offsets join)
              .when(col("s").cast("double").isNaN,
                lit((RankBuckets + 2).toLong))
              .when(col("lo") < col("hi"), expr(
                s"width_bucket(CAST(s AS DOUBLE), CAST(lo AS DOUBLE), " +
                  s"CAST(hi AS DOUBLE), $RankBuckets)"))
              .otherwise(lit(1L)))
          .drop("lo", "hi")
        // exclusive prefix offsets over ≤ RankBuckets+2 bucket totals:
        // a triangular self-join, not a window — nothing in this plan
        // runs unpartitioned
        val bTotals = withB.groupBy(col("b")).agg(sum(col("c")).as("bc"))
        val bOffs = bTotals.as("x")
          .join(bTotals.as("y"), col("y.b") < col("x.b"), "left")
          .groupBy(col("x.b"))
          .agg(coalesce(sum(col("y.bc")), lit(0L)).as("b_off"))
        val wb = Window.partitionBy(col("b")).orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)
        withB.join(broadcast(bOffs), "b")
          .withColumn("cum_before",
            col("b_off") + coalesce(sum(col("c")).over(wb), lit(0L)))
      }
    val ranked = withCum
      // average rank of the tie group = rows before + (size+1)/2
      .withColumn("avg_rank", col("cum_before") + (col("c") + 1) / 2.0)
    val aggCols = Seq(
      sum(col("pos_c") * col("avg_rank")).as("rank_sum"),
      sum(col("pos_c")).as("n_pos_d"),
      sum(col("c") - col("pos_c")).as("n_neg_d"))
    val totals =
      if (gNames.isEmpty) ranked.agg(aggCols.head, aggCols.tail: _*)
      else ranked.groupBy(gCols: _*).agg(aggCols.head, aggCols.tail: _*)
    totals.select((gCols ++ Seq(
      when(col("n_pos_d") > 0 && col("n_neg_d") > 0,
        (col("rank_sum") - col("n_pos_d") * (col("n_pos_d") + 1) / 2.0)
          / (col("n_pos_d") * col("n_neg_d"))).as("auc"),
      col("n_pos_d").cast("long").as("n_pos"),
      col("n_neg_d").cast("long").as("n_neg"))): _*)
  }

  /** A9: plain accuracy plus the row count, from ONE aggregation —
    * callers report (accuracy, n) without a second count job. */
  def accuracy(df: DataFrame, pred: Column, label: Column): DataFrame =
    df.agg(avg(when(pred === label, 1.0).otherwise(0.0)).as("accuracy"),
      count(lit(1)).as("n"))

  /** A10: per-class precision/recall/F1 from (label, pred) pairs —
    * one confusion-count aggregation, then pure column arithmetic. */
  def classificationReport(df: DataFrame, pred: Column, label: Column): DataFrame = {
    val conf = df.select(label.cast("long").as("y"), pred.cast("long").as("p"))
    val tp = sum(when(col("y") === col("p"), 1L).otherwise(0L))
    val byClass = conf.groupBy(col("y").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("p") === col("y"), 1L).otherwise(0L)).as("tp"))
    val predCounts = conf.groupBy(col("p").as("cls"))
      .agg(count(lit(1)).as("pred_n"))
    byClass.join(predCounts, Seq("cls"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "pred_n"))
      .withColumn("precision",
        when(col("pred_n") > 0, col("tp") / col("pred_n")).otherwise(0.0))
      .withColumn("recall",
        when(col("support") > 0, col("tp") / col("support")).otherwise(0.0))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))
      .select(col("cls"), col("support"), col("pred_n"), col("tp"),
        col("precision"), col("recall"), col("f1"))
  }
}
