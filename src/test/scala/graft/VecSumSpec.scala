package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Pins for the elementwise array-sum aggregate (`graft_vec_sum`):
  * closed-form agreement with per-element sum columns, null-row
  * skipping, empty-group null, keyed grouping, and the length-mismatch
  * rejection. Float-order caveats match `sum` (consumers quantize
  * cross-engine results — the IterativeState contract). */
class VecSumSpec extends SparkSpec {

  private def vs(c: org.apache.spark.sql.Column) =
    GraftFunctions.vecSum(spark, c)

  test("matches per-element sum columns on integer-valued doubles") {
    import spark.implicits._
    // integer-valued doubles: float sums are exact, so the comparison
    // is equality, not tolerance
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)(Array.fill(5)(rnd.nextInt(1000).toDouble))
    val df = rows.map(Tuple1(_)).toDF("v").repartition(8)
    val got = df.agg(vs($"v").as("s")).head().getSeq[Double](0)
    val want = (0 until 5).map(i => rows.map(_(i)).sum)
    assert(got == want)
  }

  test("keyed grouping sums per group; empty arrays-of-nulls skip") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(Array(1.0, 2.0))),
      ("a", None),
      ("a", Some(Array(10.0, 20.0))),
      ("b", Some(Array(5.0, 7.0)))).toDF("k", "v")
    val got = df.groupBy($"k").agg(vs($"v").as("s"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(got.toSeq == Seq(("a", Seq(11.0, 22.0)), ("b", Seq(5.0, 7.0))))
  }

  test("all-null group yields null (like sum)") {
    import spark.implicits._
    val df = Seq(("a", Option.empty[Array[Double]])).toDF("k", "v")
    val r = df.groupBy($"k").agg(vs($"v").as("s")).head()
    assert(r.isNullAt(1))
  }

  test("length mismatch within a group throws") {
    import spark.implicits._
    val df = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).map(Tuple1(_))
      .toDF("v").repartition(1)
    val e = intercept[Exception] { df.agg(vs($"v")).head() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("length mismatch")))
  }

  test("partial-aggregation layout does not change the exact result") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => Array(i.toDouble, (i * 3).toDouble))
    val results = Seq(1, 4, 32).map { p =>
      rows.map(Tuple1(_)).toDF("v").repartition(p)
        .agg(vs($"v").as("s")).head().getSeq[Double](0)
    }
    // integer-valued doubles well under 2^53: exact in any order
    assert(results.distinct.size == 1)
  }
}
