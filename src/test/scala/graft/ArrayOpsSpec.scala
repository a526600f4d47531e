package graft

import org.apache.spark.sql.functions._
import graft.ops.ArrayOps._

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  private def row1(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c.as("r")).collect()(0)
  private def evalD(c: org.apache.spark.sql.Column): Double = row1(c).getDouble(0)
  private def evalL(c: org.apache.spark.sql.Column): Long = row1(c).getLong(0)
  private def evalSeq(c: org.apache.spark.sql.Column): Seq[Double] =
    row1(c).getSeq[Double](0).toList
  private def evalSeq2(c: org.apache.spark.sql.Column): Seq[Seq[Double]] =
    row1(c).getSeq[scala.collection.Seq[Double]](0).map(_.toList).toList

  test("arraySum / arrayMean / dot / l2 / cosine") {
    assert(evalD(arraySum(array(lit(1.0), lit(2.0), lit(3.5)))) == 6.5)
    assert(evalD(arrayMean(array(lit(1.0), lit(2.0), lit(3.0)))) == 2.0)
    assert(evalD(dot(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0)))) == 11.0)
    assert(evalD(l2Norm(array(lit(3.0), lit(4.0)))) == 5.0)
    assert(approxEqual(
      evalD(cosine(array(lit(1.0), lit(0.0)), array(lit(1.0), lit(1.0)))),
      1.0 / math.sqrt(2)))
  }

  test("oneHot and oneHotFuse (P1/P2)") {
    val oh = evalSeq(oneHot(lit(2), 4))
    assert(oh == Seq(0.0, 0.0, 1.0, 0.0))
    val fused = evalSeq2(
      oneHotFuse(array(lit(5.0), lit(7.0)), array(lit(0), lit(2)), 3))
    assert(fused == Seq(Seq(5.0, 0.0, 0.0), Seq(0.0, 0.0, 7.0)))
  }

  test("softmax / logSoftmax / logSumExp stable (A4/W9/P15)") {
    val sm = evalSeq(softmax(array(lit(1.0), lit(2.0), lit(3.0))))
    assert(approxEqual(sm.sum, 1.0))
    assert(approxEqual(sm(2) / sm(1), math.exp(1.0)))
    // large values must not overflow
    val lse = evalD(logSumExp(array(lit(1000.0), lit(1000.0))))
    assert(approxEqual(lse, 1000.0 + math.log(2.0)))
    val ls = evalSeq(logSoftmax(array(lit(0.0), lit(0.0))))
    assert(approxEqual(ls(0), math.log(0.5)))
  }

  test("argmax (W8) 1-based, first on ties") {
    assert(evalL(argmax(array(lit(1.0), lit(9.0), lit(9.0)))) == 2L)
  }

  test("conv1dSame zero padding (W1)") {
    // kernel [1,2,1] center=2: out[1] = 0*1 + 1*2 + 2*1 = 4
    val out = evalSeq(
      conv1dSame(array(lit(1.0), lit(2.0), lit(3.0)), Seq(1.0, 2.0, 1.0)))
    assert(out == Seq(4.0, 8.0, 8.0))
    // identity kernel
    val id = evalSeq(
      conv1dSame(array(lit(4.0), lit(5.0)), Seq(0.0, 1.0, 0.0)))
    assert(id == Seq(4.0, 5.0))
  }

  test("smooth3 shrinking edges") {
    val out = evalSeq(smooth3(array(lit(3.0), lit(6.0), lit(9.0))))
    assert(out == Seq(4.5, 6.0, 7.5))
  }

  test("emaLast / emaScan recurrence (W7)") {
    // ema = [1, .9+ .1*2=1.1, 1.1*.9+.1*3=1.29]
    val last = evalD(emaLast(array(lit(1.0), lit(2.0), lit(3.0)), 0.1))
    assert(approxEqual(last, 1.29))
    val scan = evalSeq(emaScan(array(lit(1.0), lit(2.0), lit(3.0)), 0.1))
    assert(scan.size == 3 && approxEqual(scan(1), 1.1) && approxEqual(scan(2), 1.29))
    // single element
    assert(evalD(emaLast(array(lit(7.0)), 0.5)) == 7.0)
  }

  test("relu / prefix / lastElem / matVec") {
    assert(evalSeq(relu(array(lit(-1.0), lit(2.0)))) == Seq(0.0, 2.0))
    assert(evalSeq(prefix(array(lit(1.0), lit(2.0), lit(3.0)), lit(2))) == Seq(1.0, 2.0))
    assert(evalD(lastElem(array(lit(1.0), lit(2.0)))) == 2.0)
    val mv = evalSeq(matVec(Seq(Seq(1.0, 0.0), Seq(1.0, 1.0)),
      array(lit(3.0), lit(4.0))))
    assert(mv == Seq(3.0, 7.0))
  }

  test("native matVec overload is bit-equal to the HOF spelling") {
    // irrational-heavy values so any fold-order difference would show
    val w = Seq(Seq(math.Pi, -math.E, 0.1), Seq(1e-7, math.sqrt(2), -3.7))
    val x = array(lit(1.0 / 3.0), lit(-math.Pi), lit(2.5))
    val hof = evalSeq(matVec(w, x))
    val native = evalSeq(matVec(spark, w, x))
    assert(native == hof, s"$native != $hof")
  }
}
