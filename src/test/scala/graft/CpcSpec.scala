package graft

import org.apache.spark.sql.functions._
import graft.ops.Cpc

/** GRU recurrence (W2): the HOF column scan must equal the plain-Scala
  * fold, and closed-form hand checks must hold. */
class CpcSpec extends SparkSpec {
  import spark.implicits._

  private def runScan(w: Cpc.GruWeights, xs: Seq[Double]): Seq[Double] =
    Seq(xs).toDF("xs")
      .select(Cpc.gruScan(w, col("xs")).as("h"))
      .collect()(0).getSeq[Double](0).toList

  test("column scan equals Scala reference fold (hidden 2 and 3)") {
    val rnd = new scala.util.Random(5)
    for (h <- Seq(2, 3); trial <- 1 to 3) {
      val w = Cpc.demoWeights(h, seed = 100L * h + trial)
      val xs = Seq.fill(10 + rnd.nextInt(20))(rnd.nextDouble() * 2 - 1)
      val got = runScan(w, xs)
      val want = Cpc.gruScanRef(w, xs)
      got.zip(want).foreach { case (g, e) =>
        assert(approxEqual(g, e, 1e-12), s"h=$h trial=$trial: $got vs $want")
      }
    }
  }

  test("torch-convention scan equals its Scala fold and a hand closed form") {
    val rnd = new scala.util.Random(9)
    for (h <- Seq(2, 3); trial <- 1 to 3) {
      val w = Cpc.demoWeights(h, seed = 300L * h + trial)
      val bhn = Seq.tabulate(h)(i => 0.05 * (i + 1) - 0.1)
      val xs = Seq.fill(8 + rnd.nextInt(12))(rnd.nextDouble() * 2 - 1)
      val got = Seq(xs).toDF("xs")
        .select(Cpc.gruScanTorch(w, bhn, col("xs")).as("h"))
        .collect()(0).getSeq[Double](0).toList
      val want = Cpc.gruScanTorchRef(w, bhn, xs)
      got.zip(want).foreach { case (g, e) =>
        assert(approxEqual(g, e, 1e-12), s"h=$h trial=$trial: $got vs $want")
      }
    }
    // hand closed form, hidden 1, one step from h = 0 (U terms vanish
    // but bhn survives INSIDE r ⊙ (U h + b_hn) — the torch-specific
    // placement):  n = tanh(wh·x + bh + r·bhn), h' = (1 − z)·n
    val w1 = Cpc.GruWeights(
      wz = Seq(0.7), uz = Seq(Seq(0.3)), bz = Seq(0.1),
      wr = Seq(-0.4), ur = Seq(Seq(0.2)), br = Seq(0.2),
      wh = Seq(0.9), uh = Seq(Seq(-0.5)), bh = Seq(-0.1))
    val x = 0.6
    def sig(t: Double) = 1.0 / (1.0 + math.exp(-t))
    val z = sig(0.7 * x + 0.1)
    val r = sig(-0.4 * x + 0.2)
    val n = math.tanh(0.9 * x - 0.1 + r * 0.25)
    val expect = (1.0 - z) * n
    val one = Seq(Seq(x)).toDF("xs")
      .select(Cpc.gruScanTorch(w1, Seq(0.25), col("xs")).as("h"))
      .collect()(0).getSeq[Double](0).head
    assert(approxEqual(one, expect, 1e-12), s"$one vs $expect")
    // and the two conventions genuinely differ on the same weights
    val cho = Cpc.gruScanRef(w1, Seq(x)).head
    assert(!approxEqual(one, cho, 1e-6), "conventions coincide unexpectedly")
  }

  test("zero weights: state stays at fixed point of the zero-gate update") {
    // all weights/biases 0 → z = σ(0) = 0.5, h̃ = tanh(0) = 0,
    // so h' = 0.5·h → starting at 0, state stays 0
    val w = Cpc.GruWeights(
      Seq(0.0, 0.0), Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)), Seq(0.0, 0.0),
      Seq(0.0, 0.0), Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)), Seq(0.0, 0.0),
      Seq(0.0, 0.0), Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)), Seq(0.0, 0.0))
    assert(runScan(w, Seq(1.0, -2.0, 3.0)) == Seq(0.0, 0.0))
  }

  test("one-step closed form") {
    // single step from h=0 with scalar weights: z = σ(wz·x), r unused
    // (h=0), h̃ = tanh(wh·x), h' = z·h̃
    val w = Cpc.GruWeights(
      Seq(0.7), Seq(Seq(0.3)), Seq(0.1),
      Seq(0.2), Seq(Seq(0.4)), Seq(-0.1),
      Seq(1.1), Seq(Seq(0.6)), Seq(0.05))
    val x = 0.8
    val z = 1.0 / (1.0 + math.exp(-(0.7 * x + 0.1)))
    val expected = z * math.tanh(1.1 * x + 0.05)
    val got = runScan(w, Seq(x))
    assert(approxEqual(got.head, expected, 1e-12))
  }

  test("empty series returns the zero initial state") {
    val w = Cpc.demoWeights(2)
    assert(runScan(w, Seq.empty) == Seq(0.0, 0.0))
  }

  test("conv1dChannels equals Scala reference (multi-channel W1)") {
    val rnd = new scala.util.Random(9)
    // 3 in-channels → 2 out-channels, k=3, random weights, length 7
    val w = Seq.fill(2)(Seq.fill(3)(Seq.fill(3)(rnd.nextDouble() - 0.5)))
    val bias = Seq(0.1, -0.2)
    val x = Seq.fill(7)(Seq.fill(3)(rnd.nextDouble() * 2 - 1))
    val got = Seq(x).toDF("x")
      .select(Cpc.conv1dChannels(col("x"), w, bias).as("y"))
      .collect()(0).getSeq[scala.collection.Seq[Double]](0).map(_.toList)
    val want = Cpc.conv1dChannelsRef(x, w, bias)
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(approxEqual(a, b, 1e-12)) }
    }
  }

  test("conv1dSame is shift-equivariant away from the boundary") {
    val rnd = new scala.util.Random(13)
    val x = Seq.fill(20)(rnd.nextDouble() * 4 - 2)
    val k = Seq(0.2, 0.5, 0.3)
    def convOf(xs: Seq[Double]): Seq[Double] =
      Seq(xs).toDF("x")
        .select(graft.ops.ArrayOps.conv1dSame(col("x"), k).as("y"))
        .collect()(0).getSeq[Double](0)
    val y = convOf(x)
    val yShift = convOf(0.0 +: x) // shift input right by one
    // interior outputs shift with the input (boundary rows excluded)
    (2 until x.size).foreach { i =>
      assert(approxEqual(yShift(i + 1), y(i), 1e-12),
        s"i=$i ${yShift(i + 1)} vs ${y(i)}")
    }
  }

  test("native graft_cpc_encode and graft_gru_scan are BIT-EQUAL to the HOF chain on real series") {
    // the q75 hot path: the native kernels replicate the HOF spelling's
    // exact operation order (left-associative reduces seeded from the
    // first term, 0.0·w products for empty one-hot lanes, Math.max
    // relu, ((w·x)+b)+Σ gate linears), so the contract is ==, not ≈ —
    // the same discipline as graft_simhash32 / the native matVec
    val s = spark
    // the PRODUCTION q75 weights, not a copy — if CpcQueries ever
    // regenerates them, this pin must follow
    val encW = graft.queries.CpcQueries.encW
    val encBias = graft.queries.CpcQueries.encBias
    val k2 = graft.queries.CpcQueries.conv2Kernel
    val gruW = graft.queries.CpcQueries.gru
    val e = graft.Tables.events(s, "/root/testdata/sf0.001")
      .withColumn("quality", pmod(col("event_id"), lit(16)).cast("int"))
    val series = graft.ops.SeriesOps.assemble(e, col("user_id"), col("ts"),
      "v" -> (col("value") / 100.0), "q" -> col("quality"))
      .filter(size(col("v")) >= 12)
    val hofZ = series
      .withColumn("fused16", graft.ops.ArrayOps.oneHotFuse(col("v"), col("q"), 16))
      .withColumn("enc", Cpc.conv1dChannels(col("fused16"), encW, encBias))
      .withColumn("z1", transform(col("enc"), ch =>
        greatest(element_at(ch, 1), lit(0.0)) +
          greatest(element_at(ch, 2), lit(0.0))))
      .withColumn("z", graft.ops.ArrayOps.relu(
        graft.ops.ArrayOps.conv1dSame(col("z1"), k2)))
      .withColumn("ctx", Cpc.gruScan(gruW,
        graft.ops.ArrayOps.prefix(col("z"), size(col("z")) / 2)))
    val natZ = series
      .withColumn("z", graft.expr.GraftFunctions.cpcEncode(
        s, col("v"), col("q"), encW, encBias, k2))
      .withColumn("ctx", graft.expr.GraftFunctions.gruScan(
        s, graft.ops.ArrayOps.prefix(col("z"), size(col("z")) / 2), gruW))
    val hof = hofZ.select(col("series_key"), col("z"), col("ctx"))
      .orderBy(col("series_key")).collect()
    val nat = natZ.select(col("series_key"), col("z"), col("ctx"))
      .orderBy(col("series_key")).collect()
    assert(hof.nonEmpty && hof.length == nat.length)
    hof.zip(nat).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      val (za, zb) = (a.getSeq[Double](1), b.getSeq[Double](1))
      assert(za.length == zb.length)
      za.zip(zb).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y),
          s"z diverges on key ${a.getLong(0)}: $x vs $y") }
      val (ca, cb) = (a.getSeq[Double](2), b.getSeq[Double](2))
      ca.zip(cb).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y),
          s"ctx diverges on key ${a.getLong(0)}: $x vs $y") }
    }
  }

  test("conv1dChannels composes with oneHotFuse (reference encoder shape)") {
    // (value, quality) rows → 4-channel one-hot fuse → 4→2 channel conv
    val w = Seq.fill(2)(Seq.fill(4)(Seq(0.0, 1.0, 0.0))) // identity tap
    val bias = Seq(0.0, 0.0)
    val fused = graft.ops.ArrayOps.oneHotFuse(
      array(lit(5.0), lit(7.0)), array(lit(1), lit(3)), 4)
    val out = Seq(1).toDF("d")
      .select(Cpc.conv1dChannels(fused, w, bias).as("y"))
      .collect()(0).getSeq[scala.collection.Seq[Double]](0)
    // identity center tap + all-channel sum weight 1 → out = value at t
    assert(out.map(_.head) == Seq(5.0, 7.0))
  }
}
