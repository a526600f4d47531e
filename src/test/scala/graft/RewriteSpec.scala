package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions
import graft.ops.ArrayOps

/** DotRewrite optimizer-rule contracts: the HOF norm² spelling is
  * swapped for the native DotExpr kernel exactly when the rewrite is
  * provably semantics-preserving, and the rewritten plan computes
  * bit-identical values (DotExpr documents the same left-to-right
  * fold). */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // typed Seq[Double] schema → ARRAY<DOUBLE NOT NULL> (the fire case);
  // localCheckpoint pins a plan boundary so ConvertToLocalRelation
  // can't constant-fold the projection away before the rule is visible
  private lazy val typed = Seq(
    (1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(0.5, -1.5, 4.0))).toDF("id", "v")
    .localCheckpoint(true)

  test("norm² HOF over a non-null typed array is rewritten to graft_dot") {
    GraftFunctions.register(spark)
    val df = typed.select($"id", ArrayOps.dot($"v", $"v").as("n2"))
    assert(optimized(df).contains("graft_dot"), optimized(df))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 14.0 && got(2L) == 18.5, got.toString)
  }

  test("l2Norm (sqrt of the HOF norm²) picks up the kernel too") {
    GraftFunctions.register(spark)
    val df = typed.select(ArrayOps.l2Norm($"v").as("n"))
    assert(optimized(df).contains("graft_dot"), optimized(df))
    assert(approxEqual(df.collect()(0).getDouble(0), math.sqrt(14.0)))
  }

  test("no rewrite for distinct arrays (zip_with padding semantics)") {
    GraftFunctions.register(spark)
    val two = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val df = two.select(ArrayOps.dot($"a", $"b").as("d"))
    assert(!optimized(df).contains("graft_dot"), optimized(df))
    assert(df.collect()(0).getDouble(0) == 11.0)
  }

  test("no rewrite for nullable-element arrays (NULL element semantics)") {
    GraftFunctions.register(spark)
    // array() over parquet-style nullable doubles → containsNull=true
    val nullable = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS v")
    val df = nullable.select(ArrayOps.dot($"v", $"v").as("n2"))
    assert(!optimized(df).contains("graft_dot"), optimized(df))
    // and the HOF semantics (NULL element → NULL result) are preserved
    assert(df.collect()(0).isNullAt(0))
  }
}
