package graft

import graft.queries.Registry

/** Golden-shape + trend contracts for the epoch-trajectory protocol
  * (q88/q89/q90) — the engine-side analogue of the reference's
  * UNSUPERVISED/SUPERVISED result tables: AUC must rise and BCE must
  * fall as the per-epoch weight table converges toward the informative
  * representation. Runs at sf0.01 (sf0.001 has too few users for
  * stable rank statistics). */
class TrajectorySpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("q89: supervised AUC rises and BCE falls monotonically per model") {
    val rows = Registry.byName("q89_sup_trajectory").run(spark, sf01)
      .collect().map(r => (r.getString(1), r.getInt(0),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 15) // 3 models x epochs 0..4
    rows.groupBy(_._1).foreach { case (model, rs) =>
      val byEpoch = rs.sortBy(_._2)
      val aucs = byEpoch.map(_._3)
      val bces = byEpoch.map(_._4)
      // non-decreasing per step (outputs are 4-dp rounded — adjacent
      // epochs may legitimately plateau), strict endpoint-to-endpoint
      assert(aucs.zip(aucs.tail).forall { case (a, b) => a <= b },
        s"$model AUC not monotone: ${aucs.mkString(",")}")
      assert(aucs.last > aucs.head, s"$model AUC flat overall")
      assert(bces.zip(bces.tail).forall { case (a, b) => a >= b },
        s"$model BCE not monotone: ${bces.mkString(",")}")
      assert(bces.last < bces.head, s"$model BCE flat overall")
    }
  }

  test("q88: probe trajectory clears its epoch-0 floor") {
    val rows = Registry.byName("q88_unsup_trajectory").run(spark, sf01)
      .collect().map(r => ((r.getString(1), r.getString(2), r.getInt(0)),
        r.getDouble(4))).toMap
    assert(rows.size == 27) // 3 models x {0,2,4} x 3 classifiers
    // ScoreThreshold: epoch 4 is exactly the informative representation
    // (alpha = 1) -> beats the epoch-0 noise floor for every model;
    // T and TS share channel 1, so their thresholds coincide.
    Seq("T_CPC", "TS_CPC", "S_CPC").foreach { m =>
      assert(rows((m, "ScoreThreshold", 4)) > rows((m, "ScoreThreshold", 0)),
        s"$m threshold trajectory flat")
    }
    assert(rows(("T_CPC", "ScoreThreshold", 4)) ==
      rows(("TS_CPC", "ScoreThreshold", 4)))
    // trained probes: averaged over models the trained rep beats the
    // noise rep for BOTH classifier heads (per-model epoch-0 AUC is
    // small-sample noisy by design)
    def gridMean(cls: String, e: Int): Double =
      Seq("T_CPC", "TS_CPC", "S_CPC").map(m => rows((m, cls, e))).sum / 3
    val lr0 = gridMean("LogisticRegression", 0)
    val lr4 = gridMean("LogisticRegression", 4)
    assert(lr4 > lr0 + 0.02, s"LR trajectory flat: $lr0 -> $lr4")
    // ClassifierNN: an epoch-0-vs-4 TREND margin is not meaningful for
    // the NN head at this sf — with ~30 test users the high-capacity
    // head's epoch-0 AUC is small-sample noise (it memorizes the md5
    // noise channels), so lock the two properties that ARE stable:
    // (a) at convergence (epoch 4, alpha = 1: the informative rep) the
    //     NN clears the 0.5 random floor decisively — a collapsed or
    //     diverged fit lands at ~0.5 and fails;
    // (b) NN-vs-LR ordering: the epoch-4 rep is linearly separable, so
    //     the two-hidden-layer head must track the linear probe
    //     (UNSUPERVISED.csv's best cell is a ClassifierNN row).
    val nn4 = gridMean("ClassifierNN", 4)
    assert(nn4 > 0.6, s"NN head does not clear the random floor: $nn4")
    assert(nn4 > lr4 - 0.05, s"NN head underperforms LR at epoch 4: $nn4 vs $lr4")
  }

  test("q137: GD grid agrees with the Spark ML protocol it replaces") {
    val gd = Registry.byName("q137_gd_probe_grid").run(spark, sf01)
      .collect().map(r => ((r.getString(1), r.getString(2), r.getInt(0)),
        r.getDouble(4))).toMap
    assert(gd.size == 18) // 3 models x {0,2,4} x {GD_LogReg, ScoreThreshold}
    val ml = Registry.byName("q88_unsup_trajectory").run(spark, sf01)
      .collect().map(r => ((r.getString(1), r.getString(2), r.getInt(0)),
        r.getDouble(4))).toMap
    for (m <- Seq("T_CPC", "TS_CPC", "S_CPC"); e <- Seq(0, 2, 4)) {
      // the probe-free slice is IDENTICAL protocol in both queries —
      // exact agreement, not approximate
      assert(gd((m, "ScoreThreshold", e)) == ml((m, "ScoreThreshold", e)),
        s"$m/$e threshold: ${gd((m, "ScoreThreshold", e))} vs " +
          s"${ml((m, "ScoreThreshold", e))}")
      // the trained probes solve the same convex problem two ways
      // (LBFGS-with-regularization vs converged standardized GD):
      // rank statistics on ~30 test users may differ by a few swapped
      // pairs, never by a qualitatively different fit
      assert(math.abs(gd((m, "GD_LogReg", e)) -
        ml((m, "LogisticRegression", e))) < 0.08,
        s"$m/$e GD ${gd((m, "GD_LogReg", e))} vs " +
          s"ML ${ml((m, "LogisticRegression", e))}")
    }
  }

  test("q160: GD MLP grid brackets the Spark ML ClassifierNN cells") {
    val gd = Registry.byName("q160_gd_mlp_grid").run(spark, sf01)
      .collect().map(r => ((r.getString(1), r.getInt(0)), r.getDouble(4)))
      .toMap
    assert(gd.size == 9) // 3 models x {0,2,4}, GD_MLP only
    val ml = Registry.byName("q88_unsup_trajectory").run(spark, sf01)
      .collect().map(r => ((r.getString(1), r.getString(2), r.getInt(0)),
        r.getDouble(4))).toMap
    for (m <- Seq("T_CPC", "TS_CPC", "S_CPC")) {
      // per-cell bracket vs the Spark ML NN at EPOCH 4 only — the
      // informative representation, where the fit is determined by the
      // data, not by which noise channels a high-capacity head happens
      // to memorize (epochs 0/2 are the noise/half-noise regime whose
      // per-cell AUC is small-sample noise by design — the q88 NN
      // rationale; measured epoch-0 spread up to 0.14 between two
      // CORRECT fits). Different optimizer (full-batch GD vs LBFGS)
      // and width (16 vs 64) on the same problem: a few swapped rank
      // pairs on ~30 test users, never a qualitatively different fit
      // (measured max epoch-4 gap 0.016 at sf0.01).
      assert(math.abs(gd((m, 4)) - ml((m, "ClassifierNN", 4))) < 0.08,
        s"$m/4 GD_MLP ${gd((m, 4))} vs ML ${ml((m, "ClassifierNN", 4))}")
      // the converged (epoch-4) rep beats the random floor decisively
      assert(gd((m, 4)) > 0.6, s"$m epoch-4 MLP at the random floor")
    }
    // grid-mean trajectory rises epoch 0 -> 4 (per-model epoch-0 AUC
    // is small-sample noisy, the q88 NN rationale)
    val m0 = Seq("T_CPC", "TS_CPC", "S_CPC").map(m => gd((m, 0))).sum / 3
    val m4 = Seq("T_CPC", "TS_CPC", "S_CPC").map(m => gd((m, 4))).sum / 3
    assert(m4 > m0 + 0.02, s"MLP grid trajectory flat: $m0 -> $m4")
  }

  test("q91: PCA scatter separates the classes in latent space") {
    val df = Registry.byName("q91_pca_scatter").run(spark, sf01)
    val cents = df.collect()
      .groupBy(r => (r.getString(0), r.getInt(2)))
      .map { case (k, rs) =>
        k -> (rs.map(_.getDouble(3)).sum / rs.length,
          rs.map(_.getDouble(4)).sum / rs.length)
      }
    // the notebook's claim: the two classes occupy distinct regions of
    // the 2-d latent projection (cells 12/17 scatter by label)
    Seq("cohort_set", "range_gt").foreach { f =>
      val (c0x, c0y) = cents((f, 0))
      val (c1x, c1y) = cents((f, 1))
      val d = math.hypot(c0x - c1x, c0y - c1y)
      assert(d > 0.05, s"$f label centroids too close: $d")
    }
    // both notebook filters produce points
    assert(df.collect().map(_.getString(0)).distinct.length == 2)
  }

  test("q100: GD training curve — loss falls monotonically from ln 2") {
    val rows = Registry.byName("q100_gd_logistic").run(spark, sf01)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 6) // iter 0..5
    val first = rows.head
    // iter 0: zero weights, BCE = ln 2 on both splits
    (1 to 5).foreach(i => assert(first.getDouble(i) == 0.0))
    assert(math.abs(first.getDouble(6) - math.log(2)) < 1e-5)
    assert(math.abs(first.getDouble(7) - math.log(2)) < 1e-5)
    // train BCE strictly decreases every epoch (lr below the stable
    // bound -> plain full-batch GD descends monotonically)
    val bce = rows.map(_.getDouble(6))
    assert(bce.zip(bce.tail).forall { case (a, b) => b < a },
      s"train BCE not strictly decreasing: ${bce.mkString(",")}")
    // and the iterates converge: the last weight step is smaller than
    // the first in every coordinate-wise L2 sense
    def wvec(r: org.apache.spark.sql.Row) = (1 to 5).map(r.getDouble)
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val steps = rows.sliding(2).map(p => dist(wvec(p(0)), wvec(p(1)))).toSeq
    assert(steps.last < steps.head / 5,
      s"weight steps not contracting: ${steps.mkString(",")}")
  }

  test("q101: power-iteration direction beats every raw coordinate axis") {
    import org.apache.spark.sql.functions._
    val rows = Registry.byName("q101_pca_power").run(spark, sf01).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getLong(1)).sum
    // Rayleigh quotient of the found direction = Σ n·ms / Σ n (the
    // projections are centered, so mean-square IS variance)
    val rayleigh = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / n
    // per-axis variance of each raw embedding coordinate
    val e = graft.Tables.embeddings(spark, sf01)
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
    val maxAxisVar = e.groupBy(col("dim"))
      .agg((avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")))
        .as("v"))
      .agg(max(col("v"))).head().getDouble(0)
    // the corpus is near-isotropic (eigengap ~1%), so full convergence
    // in 3 fixed iterations is not the contract — finding a direction
    // better than ANY single axis is: a broken update (wrong centering,
    // wrong fold, sign flip mid-iteration) lands at or below axis level
    assert(rayleigh > maxAxisVar * 1.1,
      s"power direction no better than a raw axis: $rayleigh vs $maxAxisVar")
    assert(n == 500)
  }

  test("q90: comparison join is consistent with its two sides") {
    val rows = Registry.byName("q90_unsup_comparison").run(spark, sf01)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (u, s, gap) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(gap - BigDecimal(s - u)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
