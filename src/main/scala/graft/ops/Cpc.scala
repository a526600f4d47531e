package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CPC forward-pass building blocks (SURVEY.md §2.6 W2 GRU recurrence,
  * `T_CPC.py:25-26`; §2.9 M5 — weights are INPUTS, literal parameter
  * tables, not trained here).
  *
  * The GRU scan is a pure higher-order-function expression (`aggregate`
  * with an ARRAY<DOUBLE> hidden state) — no UDF, stays in codegen, and
  * is row-local: one series = one row, so the recurrence never crosses
  * a partition. Same step shape as a streaming
  * flatMapGroupsWithState update (§2.10).
  */
object Cpc {

  /** GRU weights for scalar input, hidden size H:
    * z/r/h gates each have input weight w (H), recurrent U (H×H), bias b.
    */
  final case class GruWeights(
      wz: Seq[Double], uz: Seq[Seq[Double]], bz: Seq[Double],
      wr: Seq[Double], ur: Seq[Seq[Double]], br: Seq[Double],
      wh: Seq[Double], uh: Seq[Seq[Double]], bh: Seq[Double]) {
    require(Seq(uz, ur, uh).forall(_.forall(_.size == wz.size)))
    val h: Int = wz.size
  }

  /** deterministic small test/demo weights (seeded LCG in [-0.5, 0.5)). */
  def demoWeights(h: Int, seed: Long = 42L): GruWeights = {
    var s = seed
    def nxt(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    def vec() = Seq.fill(h)(nxt())
    def mat() = Seq.fill(h)(Seq.fill(h)(nxt()))
    GruWeights(vec(), mat(), vec(), vec(), mat(), vec(), vec(), mat(), vec())
  }

  private def sigmoid(t: Column): Column = lit(1.0) / (lit(1.0) + exp(-t))

  /** one GRU step h' = GRU(h, x) as a column expression; h is
    * ARRAY<DOUBLE>(H), x is a scalar column. */
  def gruStep(w: GruWeights, h: Column, x: Column): Column = {
    def hAt(i: Int): Column = element_at(h, i + 1)
    def gate(wv: Seq[Double], u: Seq[Seq[Double]], b: Seq[Double],
             hOf: Int => Column, act: Column => Column): Seq[Column] =
      (0 until w.h).map { i =>
        act(lit(wv(i)) * x + b(i) +
          (0 until w.h).map(j => lit(u(i)(j)) * hOf(j)).reduce(_ + _))
      }
    val z = gate(w.wz, w.uz, w.bz, hAt, sigmoid)
    val r = gate(w.wr, w.ur, w.br, hAt, sigmoid)
    val hh = gate(w.wh, w.uh, w.bh, i => r(i) * hAt(i), tanh)
    array((0 until w.h).map(i =>
      (lit(1.0) - z(i)) * hAt(i) + z(i) * hh(i)): _*)
  }

  /** GRU scan over a series array (zero initial state), returning the
    * final hidden state (P8: representation = last GRU state,
    * `unsupervised.py:68`). */
  def gruScan(w: GruWeights, xs: Column): Column =
    aggregate(xs, array(Seq.fill(w.h)(lit(0.0)): _*),
      (h, x) => gruStep(w, h, x))

  /** plain-Scala reference for the same scan (ScalaTest oracle). */
  def gruScanRef(w: GruWeights, xs: Seq[Double]): Seq[Double] = {
    def sig(t: Double) = 1.0 / (1.0 + math.exp(-t))
    xs.foldLeft(Seq.fill(w.h)(0.0)) { (h, x) =>
      val z = (0 until w.h).map(i => sig(w.wz(i) * x + w.bz(i) +
        (0 until w.h).map(j => w.uz(i)(j) * h(j)).sum))
      val r = (0 until w.h).map(i => sig(w.wr(i) * x + w.br(i) +
        (0 until w.h).map(j => w.ur(i)(j) * h(j)).sum))
      val hh = (0 until w.h).map(i => math.tanh(w.wh(i) * x + w.bh(i) +
        (0 until w.h).map(j => w.uh(i)(j) * (r(j) * h(j))).sum))
      (0 until w.h).map(i => (1.0 - z(i)) * h(i) + z(i) * hh(i))
    }
  }
}
