package graft

import org.apache.spark.sql.functions._

/** Bucketing = co-located joins (SURVEY §7 / builder brief: "bucketing
  * for co-located joins"): two tables bucketed on the join key must
  * sort-merge-join WITHOUT a shuffle exchange, and produce the same
  * rows as the plain join. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join has no shuffle exchange and matches plain join") {
    val left = (1 to 500).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val right = (1 to 200).map(i => (i.toLong % 50, s"attr$i"))
      .toDF("k", "attr")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bl")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("br")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bl").join(spark.table("br"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = left.join(right, "k")
        .agg(count(lit(1)), sum($"v")).collect()(0)
      val got = joined.agg(count(lit(1)), sum($"v")).collect()(0)
      assert(got.getLong(0) == expected.getLong(0))
      assert(approxEqual(got.getDouble(1), expected.getDouble(1)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bl")
      spark.sql("DROP TABLE IF EXISTS br")
    }
  }
}
