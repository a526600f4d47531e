package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Pins for the native HLL distinct-count aggregate (HllExpr):
  * sparse-regime EXACTNESS (the q141 gate's contract), the cutover to
  * dense registers, dense-regime error bounds on planted
  * cardinalities, partition-layout independence in both regimes
  * (merge must commute), null handling, and argument validation. */
class HllSpec extends SparkSpec {

  private def hll(c: org.apache.spark.sql.Column, p: Int = 12) =
    GraftFunctions.hllDistinct(spark, c, p)

  test("sparse regime is exact for long and string keys") {
    import spark.implicits._
    for (n <- Seq(1, 100, 4096)) {
      val d = spark.range(n.toLong)
      assert(d.agg(hll($"id")).head().getLong(0) == n.toLong, s"long n=$n")
      assert(d.select(concat(lit("k"), $"id").as("k"))
        .agg(hll($"k")).head().getLong(0) == n.toLong, s"string n=$n")
    }
    // empty input → 0 (like COUNT(DISTINCT))
    assert(spark.range(0).agg(hll(col("id"))).head().getLong(0) == 0L)
  }

  test("dense regime: planted cardinalities within HLL error bounds") {
    import spark.implicits._
    // past the 2^p sparse cutover: classic estimator, rsd 1.04/√m ≈
    // 1.6% at p=12 — assert 3σ
    for (n <- Seq(20000L, 200000L)) {
      val est = spark.range(n).agg(hll($"id")).head().getLong(0)
      val rel = math.abs(est.toDouble / n - 1.0)
      assert(rel < 3 * 1.04 / 64, s"n=$n est=$est rel=$rel")
    }
  }

  test("result is independent of partition layout in both regimes") {
    import spark.implicits._
    for (n <- Seq(1000L, 50000L)) { // sparse and dense
      val ests = Seq(1, 4, 16).map(parts =>
        spark.range(n).repartition(parts).agg(hll($"id")).head().getLong(0))
      assert(ests.distinct.size == 1, s"n=$n ests=$ests")
    }
  }

  test("grouped aggregation and nulls (nulls don't count)") {
    import spark.implicits._
    val d = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(7L)), ("b", Some(7L))).toDF("g", "v")
    val got = d.groupBy($"g").agg(hll($"v").as("nd"))
      .orderBy($"g").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("sparse/dense cutover agrees with exact count within bounds") {
    import spark.implicits._
    // p=8: cutover at 256 — straddle it and check the estimate stays
    // within the dense bound right after densification
    for (n <- Seq(255L, 256L, 257L, 400L)) {
      val est = spark.range(n).agg(hll($"id", 8)).head().getLong(0)
      if (n <= 256) assert(est == n, s"sparse n=$n est=$est")
      else {
        val rel = math.abs(est.toDouble / n - 1.0)
        assert(rel < 3 * 1.04 / 16, s"dense n=$n est=$est rel=$rel")
      }
    }
  }

  test("sketch/merge/estimate rollup equals the direct aggregate") {
    import spark.implicits._
    // the warehouse shape: per-partition sketches, merged later, must
    // answer exactly what one direct pass answers — in BOTH regimes
    // (sparse: union of exact sets; dense: register max is the same
    // lattice join the shuffle merge uses)
    for (n <- Seq(2000L, 50000L)) {
      val d = spark.range(n).select($"id", ($"id" % 7).as("g"))
      val direct = d.agg(hll($"id")).head().getLong(0)
      val rolled = d.groupBy($"g")
        .agg(GraftFunctions.hllSketch(spark, $"id", 12).as("sk"))
        .agg(GraftFunctions.hllEstimate(spark,
          GraftFunctions.hllMerge(spark, $"sk")).as("nd"))
        .head().getLong(0)
      assert(rolled == direct, s"n=$n rolled=$rolled direct=$direct")
    }
  }

  test("merged sketches stay re-mergeable (day -> week -> total composes)") {
    import spark.implicits._
    val d = spark.range(3000).select($"id",
      ($"id" % 30).as("day"), ($"id" % 30 / 7).cast("long").as("wk"))
    val daily = d.groupBy($"day", $"wk")
      .agg(GraftFunctions.hllSketch(spark, $"id", 12).as("sk"))
    val weekly = daily.groupBy($"wk")
      .agg(GraftFunctions.hllMerge(spark, $"sk").as("sk"))
    val total = weekly
      .agg(GraftFunctions.hllEstimate(spark,
        GraftFunctions.hllMerge(spark, $"sk")).as("nd"))
      .head().getLong(0)
    assert(total == 3000L, s"two-level rollup $total")
  }

  test("malformed blobs and mixed precisions are rejected") {
    import spark.implicits._
    intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk")
        .agg(GraftFunctions.hllMerge(spark, col("sk"))).head()
    }
    intercept[Exception] {
      val a = spark.range(10)
        .agg(GraftFunctions.hllSketch(spark, col("id"), 10).as("sk"))
      val b = spark.range(10)
        .agg(GraftFunctions.hllSketch(spark, col("id"), 12).as("sk"))
      a.unionAll(b).agg(GraftFunctions.hllMerge(spark, col("sk"))).head()
    }
  }

  test("argument validation: p out of range / non-literal rejected") {
    import spark.implicits._
    val d = spark.range(4)
    intercept[Exception] {
      d.agg(hll($"id", 3)).head()
    }
    intercept[Exception] {
      d.agg(hll($"id", 17)).head()
    }
    intercept[Exception] { // non-integral key type
      d.select($"id".cast("double").as("v")).agg(hll($"v")).head()
    }
  }
}
