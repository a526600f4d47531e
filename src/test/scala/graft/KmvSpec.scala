package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Pins for the native KMV/theta sketch surface (KmvExpr): untrimmed
  * EXACTNESS of estimate/union/intersection (the q145 gate's
  * contract), trimmed-regime error bounds on planted cardinalities and
  * overlaps, partition-layout independence (merge must commute),
  * rollup composition, null handling, and argument/blob validation. */
class KmvSpec extends SparkSpec {

  private def sk(c: org.apache.spark.sql.Column, k: Int = 1024) =
    GraftFunctions.kmvSketch(spark, c, k)
  private def est(c: org.apache.spark.sql.Column) =
    GraftFunctions.kmvEstimate(spark, c)

  test("untrimmed regime is exact for long and string keys") {
    import spark.implicits._
    for (n <- Seq(1, 100, 1024)) {
      val d = spark.range(n.toLong)
      assert(d.agg(est(sk($"id"))).head().getLong(0) == n.toLong, s"long n=$n")
      assert(d.select(concat(lit("k"), $"id").as("k"))
        .agg(est(sk($"k"))).head().getLong(0) == n.toLong, s"string n=$n")
    }
    // empty input → 0 (like COUNT(DISTINCT))
    assert(spark.range(0).agg(est(sk(col("id")))).head().getLong(0) == 0L)
  }

  test("trimmed regime: planted cardinalities within KMV error bounds") {
    import spark.implicits._
    // past k the (k−1)/θ estimator has rsd ≈ 1/√(k−2) ≈ 3.1% at k=1024
    // — assert 4σ
    for (n <- Seq(20000L, 200000L)) {
      val e = spark.range(n).agg(est(sk($"id"))).head().getLong(0)
      val rel = math.abs(e.toDouble / n - 1.0)
      assert(rel < 4.0 / math.sqrt(1022.0), s"n=$n est=$e rel=$rel")
    }
  }

  test("result is independent of partition layout in both regimes") {
    import spark.implicits._
    for (n <- Seq(800L, 50000L)) { // untrimmed and trimmed
      val ests = Seq(1, 4, 16).map(parts =>
        spark.range(n).repartition(parts)
          .agg(est(sk($"id"))).head().getLong(0))
      assert(ests.distinct.size == 1, s"n=$n ests=$ests")
    }
  }

  test("intersection is exact while both sketches are untrimmed") {
    import spark.implicits._
    // A = [0, 600), B = [400, 1000) → |A∩B| = 200, |A∪B| = 1000
    val a = spark.range(0, 600).agg(sk($"id").as("sk")).head()
      .getAs[Array[Byte]](0)
    val b = spark.range(400, 1000).agg(sk($"id").as("sk")).head()
      .getAs[Array[Byte]](0)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        GraftFunctions.kmvIntersect(spark, $"a", $"b").as("i"),
        GraftFunctions.kmvUnionEst(spark, $"a", $"b").as("u"))
      .head()
    assert(row.getLong(0) == 200L, s"intersect ${row.getLong(0)}")
    assert(row.getLong(1) == 1000L, s"union ${row.getLong(1)}")
    // disjoint sets intersect to exactly 0
    val c = spark.range(5000, 5600).agg(sk($"id").as("sk")).head()
      .getAs[Array[Byte]](0)
    val zero = Seq((a, c)).toDF("a", "c")
      .select(GraftFunctions.kmvIntersect(spark, $"a", $"c")).head().getLong(0)
    assert(zero == 0L)
  }

  test("trimmed intersection: planted overlap within theta-sketch bounds") {
    import spark.implicits._
    // |A| = |B| = 60k, |A∩B| = 20k — both sketches trim at k=1024;
    // the intersection estimator's rsd grows by √(|A∪B|/|A∩B|) ≈ 2.24
    // over the single-sketch rsd; assert a generous 5σ of that
    val a = spark.range(0, 60000).agg(sk($"id").as("sk")).head()
      .getAs[Array[Byte]](0)
    val b = spark.range(40000, 100000).agg(sk($"id").as("sk")).head()
      .getAs[Array[Byte]](0)
    val i = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.kmvIntersect(spark, $"a", $"b"))
      .head().getLong(0)
    val rel = math.abs(i.toDouble / 20000.0 - 1.0)
    assert(rel < 5.0 * math.sqrt(5.0) / math.sqrt(1022.0),
      s"intersect est=$i rel=$rel")
  }

  test("sketch/merge/estimate rollup equals the direct aggregate") {
    import spark.implicits._
    // per-group sketches merged later answer what one direct pass
    // answers — exactly in BOTH regimes (the merged k-minimum set is
    // a function of the underlying set union, not the grouping)
    for (n <- Seq(800L, 50000L)) {
      val d = spark.range(n).select($"id", ($"id" % 7).as("g"))
      val direct = d.agg(est(sk($"id"))).head().getLong(0)
      val rolled = d.groupBy($"g")
        .agg(sk($"id").as("sk"))
        .agg(est(GraftFunctions.kmvMerge(spark, $"sk")).as("nd"))
        .head().getLong(0)
      assert(rolled == direct, s"n=$n rolled=$rolled direct=$direct")
    }
  }

  test("merged sketches stay re-mergeable (day -> week -> total composes)") {
    import spark.implicits._
    val d = spark.range(900).select($"id",
      ($"id" % 30).as("day"), ($"id" % 30 / 7).cast("long").as("wk"))
    val daily = d.groupBy($"day", $"wk").agg(sk($"id").as("sk"))
    val weekly = daily.groupBy($"wk")
      .agg(GraftFunctions.kmvMerge(spark, $"sk").as("sk"))
    val total = weekly
      .agg(est(GraftFunctions.kmvMerge(spark, $"sk")).as("nd"))
      .head().getLong(0)
    assert(total == 900L, s"two-level rollup $total")
  }

  test("grouped aggregation and nulls (nulls don't count)") {
    import spark.implicits._
    val d = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(7L)), ("b", Some(7L))).toDF("g", "v")
    val got = d.groupBy($"g").agg(est(sk($"v", 16)).as("nd"))
      .orderBy($"g").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("malformed blobs and mixed k are rejected") {
    import spark.implicits._
    intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk")
        .agg(GraftFunctions.kmvMerge(spark, col("sk"))).head()
    }
    intercept[Exception] {
      val a = spark.range(10).agg(sk(col("id"), 16).as("sk"))
      val b = spark.range(10).agg(sk(col("id"), 32).as("sk"))
      a.unionAll(b).agg(GraftFunctions.kmvMerge(spark, col("sk"))).head()
    }
    intercept[Exception] { // mixed k in the pairwise union
      val a = spark.range(10).agg(sk(col("id"), 16).as("sk")).head()
        .getAs[Array[Byte]](0)
      val b = spark.range(10).agg(sk(col("id"), 32).as("sk")).head()
        .getAs[Array[Byte]](0)
      Seq((a, b)).toDF("a", "b")
        .select(GraftFunctions.kmvUnionEst(spark, $"a", $"b")).head()
    }
  }

  test("argument validation: k out of range / bad key type rejected") {
    import spark.implicits._
    val d = spark.range(4)
    intercept[Exception] { d.agg(est(sk($"id", 8))).head() }
    intercept[Exception] { d.agg(est(sk($"id", (1 << 20) + 1))).head() }
    intercept[Exception] { // non-integral key type
      d.select($"id".cast("double").as("v")).agg(est(sk($"v"))).head()
    }
  }
}
