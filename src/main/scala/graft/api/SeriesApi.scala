package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{ArrayOps, SeriesOps}

/** Typed Dataset API boundary (SURVEY.md §1.4): the canonical series
  * frame as a case class — `Dataset[Example]` mirrors the reference's
  * example tuple `(data, acc, label, patient_id)`
  * (`exercise provided.ipynb` cell 3, consumed at `unsupervised.py:47`).
  *
  * Internals stay untyped DataFrame + column expressions (Catalyst-
  * optimizable); the typed surface is for user-facing composition and
  * compile-time schema safety at pipeline boundaries.
  */
final case class Example(
    seriesId: Long,
    patientId: Long,
    label: Int,
    ibi: Array[Double],
    acc: Array[Int])

object SeriesApi {

  /** Assemble `Dataset[Example]` from the long-form events table: one
    * example per user; ibi = value series, acc = synthetic quality
    * buckets, label = error-heavy flag (same derivation as the
    * flagship query). */
  def examplesFromEvents(spark: SparkSession, dir: String): Dataset[Example] = {
    import spark.implicits._
    val e = graft.Tables.events(spark, dir)
      .withColumn("quality", pmod(col("event_id"), lit(16)).cast("int"))
      .withColumn("is_err",
        when(col("event_type") === "error", 1.0).otherwise(0.0))
    SeriesOps.assemble(e, col("user_id"), col("ts"),
      "v" -> col("value"), "q" -> col("quality"), "err" -> col("is_err"))
      .select(
        col("series_key").as("seriesId"),
        col("series_key").as("patientId"),
        when(ArrayOps.arraySum(col("err")) > col("series_len") * 0.22, 1)
          .otherwise(0).as("label"),
        col("v").as("ibi"),
        col("q").as("acc"))
      .as[Example]
  }

  /** typed transform example: quality-fused representation per example
    * (P1×P2 → A6 mean), keeping the Dataset[T] surface. */
  def representations(ds: Dataset[Example]): Dataset[(Long, Int, Double)] = {
    import ds.sparkSession.implicits._
    ds.select(
        col("seriesId").as[Long],
        col("label").as[Int],
        ArrayOps.arrayMean(zip_with(col("ibi"), col("acc"),
          (v, q) => v * (q.cast("double") + 1.0) / 16.0)).as[Double])
  }
}
