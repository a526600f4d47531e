package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Bit-equality pin for `graft_mlp_grad` (the q160 hot-path kernel)
  * against an INDEPENDENT Column/HOF spelling of the same
  * forward+backward chain — the CpcSpec discipline: the native kernel
  * must reproduce the interpreted form's doubles EXACTLY
  * (doubleToLongBits), so swapping it into the GD loop cannot move the
  * oracle hash. Inputs are deterministic mixed-sign rationals that
  * drive both live and dead ReLU units through the gates. */
class MlpGradSpec extends SparkSpec {

  private def dotC(a: Column, b: Column) = GraftFunctions.dot(spark, a, b)

  /** the HOF backprop twin (q160's original spelling, generic h/d). */
  private def hofGrad(df: DataFrame, d: Int, h: Int): DataFrame = {
    val w2o = d * h + h
    val b2o = w2o + h * h
    val w3o = b2o + h
    val p = w3o + h + 1
    df
      .withColumn("z1", transform(sequence(lit(1), lit(h)), j =>
        dotC(slice(col("w"), (j - 1) * lit(d) + 1, lit(d)), col("xz")) +
          element_at(col("w"), lit(d * h) + j)))
      .withColumn("a1", transform(col("z1"), z => greatest(z, lit(0.0))))
      .withColumn("z2", transform(sequence(lit(1), lit(h)), j =>
        dotC(slice(col("w"), (j - 1) * lit(h) + lit(w2o + 1), lit(h)),
          col("a1")) + element_at(col("w"), lit(b2o) + j)))
      .withColumn("a2", transform(col("z2"), z => greatest(z, lit(0.0))))
      .withColumn("u",
        dotC(slice(col("w"), w3o + 1, h), col("a2")) +
          element_at(col("w"), lit(p)))
      .withColumn("err", lit(1.0) / (lit(1.0) + exp(-col("u"))) - col("y"))
      .withColumn("d2", transform(sequence(lit(1), lit(h)), j =>
        col("err") * element_at(col("w"), lit(w3o) + j) *
          when(element_at(col("z2"), j) > 0, lit(1.0)).otherwise(lit(0.0))))
      .withColumn("d1", transform(sequence(lit(1), lit(h)), j =>
        dotC(transform(sequence(lit(1), lit(h)), k =>
          element_at(col("w"), (k - 1) * lit(h) + j + lit(w2o))),
          col("d2")) *
          when(element_at(col("z1"), j) > 0, lit(1.0)).otherwise(lit(0.0))))
      .withColumn("gh", concat(
        flatten(transform(col("d1"), dj => transform(col("xz"), xi => dj * xi))),
        col("d1"),
        flatten(transform(col("d2"), dj => transform(col("a1"), ai => dj * ai))),
        col("d2"),
        transform(col("a2"), ai => col("err") * ai),
        array(col("err"))))
  }

  /** deterministic mixed-sign inputs: enough magnitude spread to leave
    * some hidden units dead (z ≤ 0) and some live on every row. */
  private def plantRows(n: Int, d: Int, h: Int): Seq[(Array[Double], Array[Double], Double)] = {
    val p = d * h + h + h * h + h + h + 1
    (0 until n).map { r =>
      val xz = Array.tabulate(d)(i => ((r * 31 + i * 17) % 19 - 9) / 4.0)
      val w = Array.tabulate(p)(k => ((r * 13 + k * 7) % 23 - 11) / 16.0)
      val y = (r % 2).toDouble
      (xz, w, y)
    }
  }

  private def pin(d: Int, h: Int, n: Int): Unit = {
    import spark.implicits._
    val df = plantRows(n, d, h).toDF("xz", "w", "y").repartition(4)
    val both = hofGrad(df, d, h)
      .withColumn("gn", GraftFunctions.mlpGrad(spark, $"xz", $"w", $"y", h))
      .select($"gh", $"gn").collect()
    assert(both.length == n)
    both.foreach { row =>
      val gh = row.getSeq[Double](0)
      val gn = row.getSeq[Double](1)
      assert(gh.length == gn.length, s"${gh.length} vs ${gn.length}")
      gh.indices.foreach { i =>
        assert(java.lang.Double.doubleToLongBits(gh(i)) ==
          java.lang.Double.doubleToLongBits(gn(i)),
          s"slot $i: hof=${gh(i)} native=${gn(i)}")
      }
    }
  }

  test("native gradient is bit-equal to the HOF backprop at q160 shape (d=7, h=16)") {
    pin(d = 7, h = 16, n = 64)
  }

  test("native gradient is bit-equal at a small odd shape (d=3, h=4)") {
    pin(d = 3, h = 4, n = 64)
  }

  test("native logit is bit-equal to the HOF forward at q160 shape") {
    import spark.implicits._
    val (d, h, n) = (7, 16, 64)
    val df = plantRows(n, d, h).toDF("xz", "w", "y").repartition(4)
    val both = hofGrad(df, d, h)
      .withColumn("un", GraftFunctions.mlpLogit(spark, $"xz", $"w", h))
      .select($"u", $"un").collect()
    assert(both.length == n)
    both.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"hof=${row.getDouble(0)} native=${row.getDouble(1)}")
    }
  }

  test("inconsistent parameter length fails with a clear message") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0), 1.0))
      .toDF("xz", "w", "y")
    val e = intercept[Exception] {
      df.select(GraftFunctions.mlpGrad(spark, $"xz", $"w", $"y", 4)).collect()
    }
    assert(e.getMessage != null)
  }
}
