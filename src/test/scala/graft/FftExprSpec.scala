package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions
import graft.ops.Fft

/** The native Catalyst expression must agree with the UDF (same kernel)
  * and be callable from SQL after registration. */
class FftExprSpec extends SparkSpec {
  import spark.implicits._

  // test-scope UDF over the same kernel — the main path exposes ONLY
  // the native expression (the UDF exists here to cross-check the
  // expression's ArrayData plumbing against plain Scala evaluation)
  private val fftMagUdf = udf((x: Seq[Double]) =>
    if (x == null) null else Fft.magnitude(x))

  test("expression ≡ UDF on random series") {
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextDouble() * 10))
    val df = data.toDF("v")
    val rows = df.select(
      GraftFunctions.fftMag(spark, $"v").as("e"),
      fftMagUdf($"v").as("u")).collect()
    rows.foreach { r =>
      val e = r.getSeq[Double](0); val u = r.getSeq[Double](1)
      assert(e.size == u.size)
      e.zip(u).foreach { case (a, b) => assert(approxEqual(a, b, 1e-12)) }
    }
  }

  test("registered SQL name works in spark.sql") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_fft_mag(array(1.0d, 0.0d, 0.0d, 0.0d)) AS m")
      .collect()(0).getSeq[Double](0)
    // impulse → flat unit spectrum
    assert(out.size == 4 && out.forall(v => approxEqual(v, 1.0)))
  }

  test("GraftExtensions registers injections; graft_dot works in SQL") {
    // extensions bind at session build; the shared test session can't
    // be rebuilt, so check the injection hook accepts our class and the
    // runtime-registered SQL name produces the native expression
    new graft.expr.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(out == 11.0)
  }

  test("null ELEMENTS are treated as 0.0, not a crash") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_fft_mag(array(1.0d, CAST(NULL AS DOUBLE), 0.0d, 0.0d)) AS m")
      .collect()(0).getSeq[Double](0)
    // ≡ impulse of length 4 → flat unit spectrum
    assert(out.size == 4 && out.forall(v => approxEqual(v, 1.0)))
  }

  test("graft_bottomk rejects k < 1 and wrong arity at analysis time") {
    GraftFunctions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bottomk(CAST(1 AS BIGINT), 0)").collect()
    }
    assert(e1.getMessage.contains("1 <= k"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_bottomk(CAST(1 AS BIGINT))").collect()
    }
    assert(e2.getMessage.contains("argument"), e2.getMessage)
    // extensions path exposes the same three-function surface
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expr.GraftExtensions()(exts)
  }

  test("null input and nested use in HOF pipeline") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_fft_mag(CAST(NULL AS ARRAY<DOUBLE>)) AS m").collect()(0)
    assert(r.isNullAt(0))
    // stays usable inside a projection chain (codegen path)
    val sum = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(aggregate(GraftFunctions.fftMag(spark, $"v"), lit(0.0),
        (s, x) => s + x).as("s")).collect()(0).getDouble(0)
    assert(sum > 0)
  }
}
