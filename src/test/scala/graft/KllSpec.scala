package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Pins for the mergeable quantile sketch (KllExpr): untrimmed
  * EXACTNESS under the DuckDB quantile_disc position convention (the
  * q150 gate's contract), exact weight conservation through
  * compaction, trimmed-regime rank-error bounds on planted data,
  * exact-regime layout independence, rollup composition, null
  * handling, and argument/blob validation. The trimmed ESTIMATE is
  * merge-order dependent by construction (compaction) — only its
  * error bound is pinned, never its value. */
class KllSpec extends SparkSpec {

  private def sk(c: org.apache.spark.sql.Column, k: Int = 4096) =
    GraftFunctions.kllSketch(spark, c, k)
  private def qs(c: org.apache.spark.sql.Column, probs: Seq[Double]) =
    GraftFunctions.kllQuantiles(spark, c, probs)

  private val Probs = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)

  /** DuckDB quantile_disc: value at 0-based sorted rank ⌈q·n⌉−1. */
  private def exactQ(sorted: IndexedSeq[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))

  test("untrimmed regime matches quantile_disc exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 7, 100, 4096)) {
      val vals = Vector.fill(n)(rnd.nextDouble() * 1000 - 500)
      val sorted = vals.sorted
      val got = vals.toDF("v").repartition(4)
        .agg(qs(sk($"v"), Probs).as("qs")).head().getSeq[Double](0)
      Probs.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == exactQ(sorted, p), s"n=$n p=$p")
      }
    }
  }

  test("exact-regime result is independent of partition layout") {
    import spark.implicits._
    val vals = (1 to 3000).map(_.toDouble * 1.5)
    val ests = Seq(1, 4, 16).map { parts =>
      vals.toDF("v").repartition(parts)
        .agg(qs(sk($"v"), Probs).as("qs")).head().getSeq[Double](0)
    }
    assert(ests.distinct.size == 1)
  }

  test("interpolated lookup is bit-identical to percentile (exact regime)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (n <- Seq(1, 2, 7, 100, 2000)) {
      val vals = Vector.fill(n)(rnd.nextDouble() * 1000 - 500)
      val df = vals.toDF("v").repartition(4)
      val got = df.agg(GraftFunctions.kllQuantilesCont(spark, sk($"v"), Probs)
        .as("qs")).head().getSeq[Double](0)
      val want = df.agg(percentile($"v", array(Probs.map(lit): _*)).as("ps"))
        .head().getSeq[Double](0)
      Probs.indices.foreach { i =>
        assert(got(i) == want(i), s"n=$n p=${Probs(i)}")
      }
    }
  }

  test("trimmed-regime MERGE is independent of partition layout") {
    import spark.implicits._
    // 40 chunk sketches at k=64, each trimmed (500 values > 64): the
    // canonical byte-sorted fold in graft_kll_merge must produce ONE
    // summary whatever layout delivers the blobs
    val rnd = new scala.util.Random(31)
    val chunks = (0 until 40).map { c =>
      (c, Vector.fill(500)(rnd.nextDouble() * 1000 - 500))
    }
    val blobs = chunks.flatMap { case (c, vs) => vs.map((c, _)) }
      .toDF("c", "v")
      .groupBy($"c").agg(sk($"v", 64).as("blob"))
      .localCheckpoint(true)
    val ests = Seq(1, 4, 16, 32).map { parts =>
      blobs.repartition(parts)
        .agg(qs(GraftFunctions.kllMerge(spark, $"blob"), Probs).as("qs"))
        .head().getSeq[Double](0)
    }
    assert(ests.distinct.size == 1,
      s"trimmed merge varies with layout: ${ests.distinct}")
  }

  test("total weight is conserved exactly through compaction") {
    // 100k values through k=256 forces many compaction cascades; the
    // sketch must still know the exact n (promote-half-at-double-
    // weight conserves mass, the odd leftover stays at its level)
    val buf = new graft.expr.KllBuf(256)
    var i = 0
    while (i < 100000) { buf.add((i * 37 % 1001).toDouble); i += 1 }
    assert(buf.trimmed)
    assert(buf.totalWeight == 100000L)
  }

  test("trimmed regime: rank error within bounds on planted data") {
    import spark.implicits._
    // values 0..n-1 (so the true rank of a value IS the value);
    // k=512 on n=200k compacts heavily; pin ≤ 3% rank error
    val n = 200000
    val d = spark.range(n).select(
      (($"id" * 127) % n).cast("double").as("v")) // deterministic shuffle
    val got = d.repartition(8)
      .agg(qs(sk($"v", 512), Seq(0.01, 0.25, 0.5, 0.9, 0.99)).as("qs"))
      .head().getSeq[Double](0)
    Seq(0.01, 0.25, 0.5, 0.9, 0.99).zipWithIndex.foreach { case (p, i) =>
      val targetRank = math.max(0, math.ceil(p * n) - 1)
      val rankErr = math.abs(got(i) - targetRank) / n.toDouble
      assert(rankErr < 0.03, s"p=$p est=${got(i)} err=$rankErr")
    }
  }

  test("sketch/merge/quantiles rollup equals the direct aggregate (exact regime)") {
    import spark.implicits._
    val d = spark.range(3000).select($"id".cast("double").as("v"),
      ($"id" % 7).as("g"))
    val direct = d.agg(qs(sk($"v"), Probs).as("qs")).head().getSeq[Double](0)
    val rolled = d.groupBy($"g").agg(sk($"v").as("sk"))
      .agg(qs(GraftFunctions.kllMerge(spark, $"sk"), Probs).as("qs"))
      .head().getSeq[Double](0)
    assert(rolled == direct)
  }

  test("merged sketches stay re-mergeable (day -> week -> total composes)") {
    import spark.implicits._
    val d = spark.range(900).select($"id".cast("double").as("v"),
      ($"id" % 30).as("day"), ($"id" % 30 / 7).cast("long").as("wk"))
    val daily = d.groupBy($"day", $"wk").agg(sk($"v").as("sk"))
    val weekly = daily.groupBy($"wk")
      .agg(GraftFunctions.kllMerge(spark, $"sk").as("sk"))
    val total = weekly
      .agg(qs(GraftFunctions.kllMerge(spark, $"sk"), Seq(0.5)).as("qs"))
      .head().getSeq[Double](0)
    assert(total == Seq(449.0), s"two-level rollup $total") // ⌈0.5·900⌉−1
  }

  test("nulls don't count; empty sketch yields null quantiles") {
    import spark.implicits._
    val d = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val got = d.agg(qs(sk($"v", 8), Seq(0.5)).as("qs"))
      .head().getSeq[Double](0)
    assert(got == Seq(1.0)) // n=2 → ⌈0.5·2⌉−1 = 0 → min
    val empty = spark.range(0).select($"id".cast("double").as("v"))
      .agg(qs(sk($"v", 8), Seq(0.5)).as("qs")).head()
    assert(empty.isNullAt(0))
  }

  test("malformed blobs, mixed k, and bad arguments are rejected") {
    import spark.implicits._
    intercept[Exception] {
      Seq(Array[Byte](9, 9, 9)).toDF("sk")
        .agg(GraftFunctions.kllMerge(spark, col("sk"))).head()
    }
    intercept[Exception] { // mixed k in merge
      val a = spark.range(10).select($"id".cast("double").as("v"))
        .agg(sk($"v", 16).as("sk"))
      val b = spark.range(10).select($"id".cast("double").as("v"))
        .agg(sk($"v", 32).as("sk"))
      a.unionAll(b).agg(GraftFunctions.kllMerge(spark, col("sk"))).head()
    }
    intercept[Exception] { // k out of range
      spark.range(4).select($"id".cast("double").as("v"))
        .agg(sk($"v", 4)).head()
    }
    intercept[Exception] { // probability outside [0, 1]
      spark.range(4).select($"id".cast("double").as("v"))
        .agg(qs(sk($"v"), Seq(1.5))).head()
    }
    intercept[Exception] { // non-double value type
      spark.range(4).agg(sk($"id")).head()
    }
  }

  test("blob round-trip preserves the buffer exactly") {
    val buf = new graft.expr.KllBuf(64)
    (1 to 5000).foreach(i => buf.add((i * 97 % 503).toDouble))
    val back = graft.expr.KllCodecForTest.roundTrip(buf)
    assert(back.k == buf.k && back.trimmed == buf.trimmed &&
      back.compactCount == buf.compactCount)
    assert(back.totalWeight == buf.totalWeight)
    assert(back.levels.map(_.toList) == buf.levels.map(_.toList))
  }
}
