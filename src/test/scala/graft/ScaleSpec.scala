package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.Tables

/** The 100-TB swap-ins (PERF.md "Known trade-offs"): sketch aggregates
  * must track their exact counterparts, and partition-layout writes
  * must prune at the scan. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct / approx_percentile track exact (sketch path)") {
    val e = Tables.events(spark, sf)
    val exact = e.agg(
      countDistinct($"user_id").cast("double").as("users"),
      percentile($"value", lit(0.5)).as("p50")).collect()(0)
    val approx = e.agg(
      approx_count_distinct($"user_id", 0.02).cast("double").as("users"),
      percentile_approx($"value", lit(0.5), lit(10000)).as("p50")).collect()(0)
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0))
      <= 0.05 * exact.getDouble(0), s"$approx vs $exact")
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1))
      <= 0.05 * math.abs(exact.getDouble(1)) + 1e-6)
  }

  test("hive-partitioned write prunes partitions at the scan") {
    val dir = tmpDir("graft_part") + "/events_p"
    Tables.events(spark, sf)
      .select($"event_type", $"user_id", $"value")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(event_type") || plan.contains("event_type"),
      s"no partition filter in:\n$plan")
    // pruned read must only touch the click partition
    val clicks = scan.count()
    val total = spark.read.parquet(dir).count()
    assert(clicks > 0 && clicks < total)
    // and the physical partitions read should be the single directory:
    val files = scan.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!files.contains("event_type=error") || clicks == total)
  }
}
