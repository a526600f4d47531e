package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{ArrayOps, SeriesOps}

/** Boundary behavior under Spark 4 ANSI mode: singletons, empties, and
  * missing join partners must not throw and must take the documented
  * values. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c.as("r")).collect()(0)

  test("singleton arrays: softmax=1, argmax=1, smooth3=identity, conv ok") {
    assert(one(ArrayOps.softmax(array(lit(3.0)))).getSeq[Double](0) == Seq(1.0))
    assert(one(ArrayOps.argmax(array(lit(3.0)))).getLong(0) == 1L)
    assert(one(ArrayOps.smooth3(array(lit(5.0)))).getSeq[Double](0) == Seq(5.0))
    val c = one(ArrayOps.conv1dSame(array(lit(2.0)), Seq(1.0))).getSeq[Double](0)
    assert(c == Seq(2.0))
  }

  test("empty arrays: sum=0, ema=null, emaScan=[], logSumExp well-defined") {
    val empty = array().cast("array<double>")
    assert(one(ArrayOps.arraySum(empty)).getDouble(0) == 0.0)
    assert(one(ArrayOps.emaLast(empty, 0.1)).isNullAt(0))
    assert(one(ArrayOps.emaScan(empty, 0.1)).getSeq[Double](0).isEmpty)
  }

  test("asofJoin: left rows with no prior right row carry nulls") {
    val left = Seq((1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1.0))
      .toDF("k", "ts", "v")
    val right = Seq((1L, Timestamp.valueOf("2026-01-01 11:00:00"), 9.9))
      .toDF("k", "ts", "rv") // only AFTER the left row
    val out = SeriesOps.asofJoin(left, right, "k", "ts", Seq("rv")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_rv")))
  }

  test("sessionize: single event is one session") {
    val df = Seq((1L, Timestamp.valueOf("2026-01-01 10:00:00")))
      .toDF("k", "ts")
    val out = SeriesOps.sessionize(df, col("k"), col("ts"), 1800L)
      .select(col("session_id")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
  }

  test("dot on unequal lengths via native expr uses min length") {
    graft.expr.GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(10.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 10.0)
  }

  test("pq_encode: argmin per sub-space, lowest codeword index on ties") {
    graft.expr.GraftFunctions.register(spark)
    // two sub-spaces of 1 dim, two codewords each; v = [1.0, 5.0]:
    // m=0 → cw 0.0 vs 2.0, equidistant from 1.0 → tie broken to j=0;
    // m=1 → cw 9.0 (d=16) loses to cw 6.0 (d=1) → j=1
    val codes = spark.sql(
      """SELECT graft_pq_encode(array(1.0d, 5.0d),
        |  array(array(array(0.0d), array(2.0d)),
        |        array(array(9.0d), array(6.0d)))) AS c""".stripMargin)
      .collect()(0).getSeq[Int](0)
    assert(codes == Seq(0, 1), codes.toString)
  }

  test("simhash32: native kernel equals the HOF spelling on real docs") {
    graft.expr.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val th = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("th", transform(split($"text", " "), x =>
        conv(substring(md5(x), 1, 8), 16, 10).cast("long")))
    val both = th.select($"doc_id",
        graft.expr.GraftFunctions.simHash32(spark, $"th").as("nat"),
        graft.queries.DedupQueries.simHashHof($"th").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)} diverges")
    }
  }

  test("pq_adc: sums lut[m][codes[m]]; shape mismatch fails loudly") {
    graft.expr.GraftFunctions.register(spark)
    val d = spark.sql(
      """SELECT graft_pq_adc(array(1, 0),
        |  array(array(10.0d, 11.0d), array(20.0d, 21.0d))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(d == 31.0, d.toString) // lut[0][1] + lut[1][0]
    // mismatched geometry (3 codes vs 2 lut sub-spaces) is a PQ
    // construction bug — it must error, not return a partial sum that
    // would silently rank wrong neighbors
    val err = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_adc(array(1, 0, 1),
          |  array(array(10.0d, 11.0d), array(20.0d, 21.0d))) AS d""".stripMargin)
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("pq_encode: geometry mismatch and null elements fail loudly") {
    graft.expr.GraftFunctions.register(spark)
    // vector shorter than the codebook's sub-space coverage: reading
    // past the end must error, not encode garbage (round-6 ADVICE)
    val short = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_encode(array(1.0d),
          |  array(array(array(0.0d), array(2.0d)),
          |        array(array(9.0d), array(6.0d)))) AS c""".stripMargin)
        .collect()
    }
    assert(short.getMessage != null)
    // vector longer than M·SUB: leftover elements are the same bug
    val long = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_encode(array(1.0d, 5.0d, 7.0d),
          |  array(array(array(0.0d), array(2.0d)),
          |        array(array(9.0d), array(6.0d)))) AS c""".stripMargin)
        .collect()
    }
    assert(long.getMessage != null)
    // null ELEMENT (type checker can't exclude it): loud error, not
    // an engine-representation-dependent read
    val nul = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_encode(array(1.0d, CAST(NULL AS DOUBLE)),
          |  array(array(array(0.0d), array(2.0d)),
          |        array(array(9.0d), array(6.0d)))) AS c""".stripMargin)
        .collect()
    }
    assert(nul.getMessage != null)
  }

  test("simhash32: null token hash fails loudly (SQL surface)") {
    graft.expr.GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash32(array(1L, CAST(NULL AS BIGINT))) AS h")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("byte_hist: empty -> zero vector, null -> null, bad buckets fail") {
    graft.expr.GraftFunctions.register(spark)
    val z = spark.sql(
      "SELECT graft_byte_hist(CAST('' AS BINARY), 4) AS h")
      .collect()(0).getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0, 0.0))
    val n = spark.sql(
      "SELECT graft_byte_hist(CAST(NULL AS BINARY), 4) AS h").collect()(0)
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_byte_hist(CAST('ab' AS BINARY), 0) AS h")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("q126 sort-fold max-run-length equals brute-force max bigram count") {
    // the O(L log L) fold the repetition filter runs per doc — the
    // PRODUCTION string, not a copy — pinned against the obvious
    // O(L²) count on random token streams (deterministic LCG) plus
    // the degenerate shapes
    val foldExpr = graft.queries.TextQueries.TopBigramFoldExpr
    var st = 7L
    def nxt(m: Int): Int = {
      st = st * 6364136223846793005L + 1442695040888963407L
      (((st >>> 33) % m) + m).toInt % m
    }
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("a"), Seq("a", "a", "a")) ++
        Seq.fill(40)(Seq.fill(2 + nxt(60))(s"w${nxt(5)}"))
    val got = cases.zipWithIndex
      .map { case (t, i) => (i, t.toArray) }.toDF("i", "t")
      .withColumn("bgs", when(size($"t") >= 2, expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .otherwise(expr("array()")))
      .withColumn("top", expr(foldExpr))
      .select($"i", $"top").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val bgs = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val want = if (bgs.isEmpty) 0 else bgs.groupBy(identity).map(_._2.size).max
      assert(got(i) == want, s"case $i: fold ${got(i)} != brute $want")
    }
  }

  test("q135 redaction chain: replace-ALL, fixed order, byte-exact") {
    import graft.queries.TextQueries
    val cases = Seq(
      // two emails in one doc — replace-ALL must hit both
      ("mail a@b.com and c.d@e-f.org end", "mail <EMAIL> and <EMAIL> end"),
      // dotted quad; the email pass must not have eaten it
      ("from 10.0.255.7 logged", "from <IP> logged"),
      ("call 555-0042 today", "call <PHONE> today"),
      // all three in one doc, interleaved
      ("x a@b.de y 1.2.3.4 z 555-9999 w", "x <EMAIL> y <IP> z <PHONE> w"),
      // no PII: text flows through untouched
      ("plain words only", "plain words only"),
      // '555-123' (3 digits) is NOT a phone; '1.2.3' is NOT an ip
      ("near 555-123 and 1.2.3 miss", "near 555-123 and 1.2.3 miss"))
    val got = cases.map(_._1).toDF("s")
      .select(TextQueries.redactPii($"s").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.mkString(" | "))
  }

  test("global AUC: NaN scores rank last (bucketed path keeps every row)") {
    // the bucketed two-phase rank must not DROP a NaN score via a
    // null width_bucket: NaN pins past the last real bucket, matching
    // Spark's ordering (NaN above all doubles). Ranks 1..4 with NaN
    // 4th: rank_sum⁺ = 2 + 4, AUC = (6 − 3) / 4 = 0.75
    val d = Seq((0.1, 0), (0.2, 1), (0.3, 0), (Double.NaN, 1))
      .toDF("score", "y")
    val r = graft.ops.Metrics.rocAuc(d, $"score", $"y").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L,
      s"n_pos=${r.getLong(1)} n_neg=${r.getLong(2)}")
    assert(math.abs(r.getDouble(0) - 0.75) < 1e-12, s"auc=${r.getDouble(0)}")
  }

  test("release chain: a corpus whose every doc is benchmark releases nothing, without throwing") {
    // hunt doc_ids whose md5("bench:"+id) first-2-hex < BenchMax — the
    // all-bench corpus: the train side is empty, so the manifest, the
    // funnel (one bench stage), and UNIMAX must all degrade cleanly
    val benchIds = Iterator.iterate(1L)(_ + 1).filter { id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"bench:$id".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString <
        graft.queries.DedupQueries.BloomScreen.BenchMax
    }.take(3).toSeq
    val docs = benchIds.map(id => (id, "alpha beta gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
    assert(graft.queries.TextQueries.releaseManifest(docs).count() == 0)
    val funnel = graft.queries.TextQueries.releaseFunnel(docs).collect()
    assert(funnel.map(_.getString(1)).toSet == Set("bench"))
    assert(funnel.map(_.getLong(2)).sum == 3L)
  }

  test("UNIMAX: a single-language corpus allocates min(budget, capacity) to it") {
    val docs = Seq((1L, "a b c d", "solo"), (2L, "e f", "solo"))
      .toDF("doc_id", "text", "lang")
    val r = graft.queries.TextQueries.unimaxAlloc(docs).collect()
    assert(r.length == 1)
    // capacity = 12, budget = 6*3 div 2 = 9 < 12: the one language is
    // unbound and takes the whole budget
    assert(r(0).getLong(4) == 9L && !r(0).getBoolean(5), r(0))
  }

  test("retention rollup: disjoint releases read as zero retention, full churn + full new") {
    val v1 = Seq(("en", 1L, 4L), ("en", 2L, 2L)).toDF("lang", "doc_id", "n_tok")
    val v2 = Seq(("en", 3L, 5L)).toDF("lang", "doc_id", "n_tok")
    val r = graft.queries.StreamingQueries.retentionOf(v1, v2)
      .collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(3) == 2L && r.getLong(5) == 1L,
      r)
    assert(r.getLong(7) == 0L, s"retention6=${r.getLong(7)}")
  }

  test("purgeFunnel: a fully-tombstoned bucket survives with zeros; empty tombstones are a no-op") {
    import graft.queries.StreamingQueries
    // rows: bucket 'x' owned entirely by doc 1, bucket 'y' by doc 2
    val rows = Seq(
      ("x", 1L, "t1", 10L, 1L), ("x", 1L, "t2", 20L, 2L),
      ("y", 2L, "t3", 30L, 3L))
      .toDF("bucket", "doc_id", "k", "c1", "c2")
    val tomb = Seq(1L).toDF("doc_id")
    val out = StreamingQueries.purgeFunnel("a", rows, tomb, "doc_id")
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // bucket x: everything purged — the funnel row SURVIVES with
    // zeros (the oracle's FULL OUTER + coalesce spelling), it does
    // not vanish from the audit
    assert(out("x") == ((2L, 2L, 0L, 0L, 0L, 0L)), out)
    assert(out("y") == ((1L, 0L, 1L, 1L, 30L, 3L)), out)
    // empty tombstone set: before == after everywhere
    val none = Seq.empty[Long].toDF("doc_id")
    val noop = StreamingQueries.purgeFunnel("a", rows, none, "doc_id")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(noop.forall { case (b, p, a) => p == 0L && b == a }, noop.toSeq)
  }

  test("parquetCached: warm reads serve the cached schema; a rewritten file re-infers") {
    import spark.implicits._
    val dir = tmpDir("graft_schemacache")
    val p = s"$dir/t.parquet"
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(p)
    val s1 = graft.Tables.parquetCached(spark, p).schema
    assert(s1.fieldNames.toSeq == Seq("id", "s"))
    assert(graft.Tables.parquetCached(spark, p).collect().length == 1)
    // regenerate with a DIFFERENT schema — the fingerprint keys on
    // the CHILDREN's (name, mtime, size), so even a rewrite within
    // one directory-mtime tick must miss and re-infer (the part-file
    // names change per write), never serve the stale StructType
    Seq((2L, "b", 3.0)).toDF("id", "s", "x").write.mode("overwrite")
      .parquet(p)
    val s2 = graft.Tables.parquetCached(spark, p).schema
    assert(s2.fieldNames.toSeq == Seq("id", "s", "x"),
      s"stale schema served: ${s2.fieldNames.toSeq}")
  }
}
