package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.{ArrayOps, Metrics, SeriesOps}

/** SURVEY.md §7 minimum slice — "per-series quality-weighted
  * representation → class-separation metric":
  *
  * events (long form) → per-user series assembly → P1×P2 quality fuse →
  * W1-lite 3-tap smoothing → P8/A6 representation (last + mean) →
  * A11 rank-sum ROC-AUC of representation vs a label derived from
  * event_type. One shuffle (assembly), then row-local array ops, then the
  * AUC aggregation — the shape that survives a 100-TB scale-up.
  */
object Flagship {
  def entry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, dir)
      // deterministic synthetic quality bucket in [0,16) (the testdata
      // has no quality column; reference: acc scores 0..15)
      .withColumn("quality", pmod($"event_id", lit(16)).cast("int"))
      .withColumn("is_error", when($"event_type" === "error", 1).otherwise(0))
    val series = SeriesOps.assemble(e, $"user_id", $"ts",
      "v" -> $"value", "q" -> $"quality", "err" -> $"is_error")
    val rep = series
      // label: error events exceed 22% of the user's events (both classes
      // non-empty at every test SF; "any error" degenerates to all-1s)
      .withColumn("label",
        when(ArrayOps.arraySum($"err".cast("array<double>")) >
          $"series_len" * 0.22, 1).otherwise(0))
      // fuse value with quality: v * (q+1)/16 — scalar form of the
      // 16-channel one-hot fuse (channel weight = bucket index)
      .withColumn("fused", zip_with($"v", $"q",
        (v, q) => v * (q.cast("double") + 1.0) / 16.0))
      .withColumn("smoothed", ArrayOps.smooth3($"fused"))
      .withColumn("representation",
        (ArrayOps.lastElem($"smoothed") + ArrayOps.arrayMean($"smoothed")) / 2.0)
    Metrics.rocAuc(rep, col("representation"), col("label"))
      .select(round($"auc", 6).as("auc"), $"n_pos", $"n_neg")
  }
}
