package graft

import org.apache.spark.sql.functions._
import graft.queries.{Registry, StreamingQueries}

/** q206's purge contract, pinned inside Spark (the gate hashes
  * per-bucket digests; this compares the purged-and-compacted
  * artifacts against from-scratch rebuilds ROW FOR ROW, so a
  * compensating-checksum collision can't hide a miss), plus a
  * planted shared-term case and the funnel's conservation laws. */
class TakedownSpec extends SparkSpec {

  private def purgedDoc = StreamingQueries.Takedown.purged(col("doc_id"))

  test("purged doc-postings compaction ≡ rebuild over corpus − D, row for row") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val tomb = docs.filter(purgedDoc).select($"doc_id")
    val purged = StreamingQueries.docPostingsOf(docs)
      .join(tomb, Seq("doc_id"), "left_anti")
    val rebuilt = StreamingQueries.docPostingsOf(docs.filter(!purgedDoc))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val (p, r) = (rows(purged), rows(rebuilt))
    assert(p == r, s"purge ≠ rebuild: ${p.diff(r).take(3)} vs ${r.diff(p).take(3)}")
    assert(p.nonEmpty)
    // no purged doc id survives in the artifact
    val dead = tomb.collect().map(_.getLong(0)).toSet
    assert(p.forall { case (d, _, _) => !dead.contains(d) })
    assert(dead.nonEmpty, "purge sample empty — the test would be vacuous")
  }

  test("planted shared term: purge drops the purged doc's postings, keeps the term live") {
    import spark.implicits._
    // find a term posted by BOTH a purged and a kept doc
    val post = StreamingQueries.docPostingsOf(
      graft.Tables.documents(spark, sf).select($"doc_id", $"text"))
      .withColumn("p", purgedDoc)
    val shared = post.groupBy($"term")
      .agg(sum(when($"p", 1L).otherwise(0L)).as("np"),
        sum(when(!$"p", 1L).otherwise(0L)).as("nk"))
      .filter($"np" > 0 && $"nk" > 0)
      .limit(1).collect()
    assert(shared.nonEmpty, "no term shared across the purge boundary")
    val t = shared(0).getString(0)
    val after = post.filter(!$"p" && $"term" === t).count()
    assert(after == shared(0).getLong(2)) // exactly the kept postings survive
    assert(after > 0)
  }

  test("q206 funnel: conservation, tombstone accounting, all three artifacts") {
    import spark.implicits._
    val sheet = Registry.byName("q206_takedown_purge").run(spark, sf)
      .localCheckpoint(true)
    assert(sheet.select($"artifact").distinct().count() == 3)
    // per row: before = purged + after, and nothing negative
    val bad = sheet.filter(
      $"rows_before" =!= $"rows_purged" + $"rows_after" ||
        $"rows_purged" < 0 || $"rows_after" < 0).count()
    assert(bad == 0)
    // something was actually purged from every artifact
    val perArtifact = sheet.groupBy($"artifact")
      .agg(sum($"rows_purged").as("p"), sum($"rows_after").as("a"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    perArtifact.foreach { case (name, (p, a)) =>
      assert(p > 0, s"$name purged nothing — vacuous gate")
      assert(a > 0, s"$name emptied — purge sample should be 1/16")
    }
    // ann_codes is keyed one row per vec: purged rows == tombstoned vecs
    val vecDead = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .filter(StreamingQueries.Takedown.purged($"vec_id")).count()
    assert(perArtifact("ann_codes")._1 == vecDead)
  }

  test("q211: purged serving excludes D everywhere, and the re-stats are load-bearing") {
    import spark.implicits._
    val sheet = Registry.byName("q211_takedown_serve").run(spark, sf)
      .localCheckpoint(true)
    assert(sheet.count() > 0)
    // no taken-down doc appears as a query OR a served chunk
    assert(sheet.filter(StreamingQueries.Takedown.purged($"doc_id"))
      .count() == 0)
    assert(sheet.filter(StreamingQueries.Takedown.purged($"q_id"))
      .count() == 0)
    // non-vacuity of the exact re-stats: BM25 under the FULL-corpus
    // globals (a stats-unaware anti-join — the naive purge) must
    // score differently somewhere, else the gate couldn't tell the
    // two implementations apart. chunkRank over the full corpus,
    // restricted to non-purged candidates, IS that naive variant.
    val purged = StreamingQueries.Takedown.purged($"doc_id")
    val qids = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id")
      .filter(!StreamingQueries.Takedown.purged($"vec_id"))
      .withColumn("h", md5(concat(lit("q162:"), $"vec_id".cast("string"))))
      .orderBy($"h", $"vec_id").limit(8)
      .select($"vec_id".as("q_id"))
    val stale = graft.queries.SimilarityQueries.chunkRank(spark,
        graft.Tables.documents(spark, sf).select($"doc_id", $"text"),
        qids)
      .filter(!purged && $"rn" <= 20)
      .select($"q_id", $"doc_id", $"chunk_idx", $"bm6".as("stale6"))
    val diff = sheet.join(stale, Seq("q_id", "doc_id", "chunk_idx"))
      .filter($"bm6" =!= $"stale6").count()
    assert(diff > 0, "stale-stats scoring agreed everywhere — the re-stats gate is vacuous")
  }

  test("q212: purged-index ANN serving excludes D and equals a frozen-codebook rebuild") {
    import spark.implicits._
    val out = Registry.byName("q212_takedown_ann_serve").run(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.filter(StreamingQueries.Takedown
      .purged($"neighbor_id")).count() == 0)
    assert(out.filter(StreamingQueries.Takedown.purged($"q_id"))
      .count() == 0)
    // the purged persisted index rows ≡ a batch re-encode of
    // embeddings − D under the FROZEN codebook, row for row (the
    // reason serve ≡ rebuild holds with no stats to re-derive)
    val purgedV = StreamingQueries.Takedown.purged($"vec_id")
    val rebuilt = StreamingQueries.annIndexDeltasOf(spark, sf,
      spark.read.parquet(s"$sf/embeddings.parquet").filter(!purgedV))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val purgedIdx = rows(
      graft.queries.SimilarityQueries.ivfadcIndex(spark, sf)
        .filter(!purgedV))
    assert(purgedIdx == rows(rebuilt) && purgedIdx.nonEmpty)
  }

  test("purge is arrival-order-invariant: tombstones win over later re-appends") {
    import spark.implicits._
    // merge-on-read purge must be an anti-join (commutative with
    // appends), so a doc re-ingested AFTER its takedown is still
    // purged — takedowns are final regardless of batch interleaving
    val sink = tmpDir("graft_purge_order")
    val wave1 = Seq((1L, "a", 2L), (2L, "b", 3L)).toDF("doc_id", "k", "tf")
    val wave2 = Seq((1L, "a", 5L), (3L, "c", 1L)).toDF("doc_id", "k", "tf")
    wave1.write.mode("append").parquet(s"$sink/deltas")
    // tombstone for doc 1 lands BETWEEN the waves; wave2 re-appends 1
    Seq(1L).toDF("doc_id").write.mode("append").parquet(s"$sink/tomb")
    wave2.write.mode("append").parquet(s"$sink/deltas")
    val compacted = spark.read.parquet(s"$sink/deltas")
      .join(spark.read.parquet(s"$sink/tomb"), Seq("doc_id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(compacted == Set((2L, "b", 3L), (3L, "c", 1L)), compacted)
  }

  test("vacuum: compaction rewrite preserves content and retires the delta+tombstone files") {
    import spark.implicits._
    // merge-on-read accumulates delta + tombstone files; VACUUM
    // rewrites the compacted state once and deletes the superseded
    // inputs — content-identical, file count collapsed
    val root = tmpDir("graft_vacuum")
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    StreamingQueries.docPostingsOf(docs)
      .repartition(8) // many delta files, as a real sink accumulates
      .write.parquet(s"$root/deltas")
    docs.filter(StreamingQueries.Takedown.purged($"doc_id"))
      .select($"doc_id").write.parquet(s"$root/tomb")
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(s"$root/deltas")
      .join(spark.read.parquet(s"$root/tomb"), Seq("doc_id"), "left_anti")
    val beforeRows = before.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val nDelta = files(s"$root/deltas").length
    assert(nDelta >= 8)
    // vacuum: rewrite compacted, then retire the inputs
    before.coalesce(1).write.parquet(s"$root/compacted")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    rmTree(new java.io.File(s"$root/deltas"))
    rmTree(new java.io.File(s"$root/tomb"))
    val after = spark.read.parquet(s"$root/compacted").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after == beforeRows && after.nonEmpty)
    assert(files(s"$root/compacted").length == 1)
    assert(!new java.io.File(s"$root/deltas").exists())
  }

  test("q213: the fused hybrid under takedown serves no doc of D on either branch") {
    import spark.implicits._
    val out = Registry.byName("q213_takedown_hybrid_serve").run(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.filter(StreamingQueries.Takedown.purged($"doc_id"))
      .count() == 0)
    assert(out.filter(StreamingQueries.Takedown.purged($"q_id"))
      .count() == 0)
    // both branches contribute (the fusion isn't degenerate): some
    // served doc carries a vector rank, some a text rank
    assert(out.filter($"vec_rank".isNotNull).count() > 0)
    assert(out.filter($"text_rank".isNotNull).count() > 0)
  }

  test("q214: the full purged RAG serves no doc of D and packs within budget") {
    import spark.implicits._
    val out = Registry.byName("q214_takedown_full_rag").run(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.filter(StreamingQueries.Takedown.purged($"doc_id"))
      .count() == 0)
    assert(out.filter(StreamingQueries.Takedown.purged($"q_id"))
      .count() == 0)
    // the packed context respects the budget and cum is monotone per query
    assert(out.filter($"cum" > 192L).count() == 0)
    val bad = out.select($"q_id", $"rn", $"cum")
      .withColumn("prev", org.apache.spark.sql.functions.lag($"cum", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"rn")))
      .filter($"prev".isNotNull && $"cum" <= $"prev").count()
    assert(bad == 0)
  }

  test("q215 wave audit: planted threshold fires the vacuum exactly once, state machine exact") {
    import spark.implicits._
    // 100 rows over 100 keys; wave A tombstones 8 (8% — under the 10%
    // threshold), wave B 8 more (16% outstanding — fires), wave C 4
    // (4/84 = 4.7% of the compacted state — under again)
    val rows = (1L to 100L).toDF("key")
      .select($"key", concat(lit("k"), $"key").as("k"),
        ($"key" * 7).as("c1"), ($"key" % 5).as("c2"))
    val waves = Seq((1L to 8L), (9L to 16L), (17L to 20L))
      .map(r => r.toDF("key"))
    val sheet = StreamingQueries.tombstoneWaveAudit("t", rows, waves,
      "key", tmpDir("graft_wavespec")).orderBy($"wave").collect()
    assert(sheet.map(_.getAs[Boolean]("vacuumed")).toSeq ==
      Seq(false, true, false))
    assert(sheet.map(_.getAs[Long]("rows_total")).toSeq ==
      Seq(100L, 100L, 84L))
    assert(sheet.map(_.getAs[Long]("rows_dead")).toSeq ==
      Seq(8L, 16L, 4L))
    assert(sheet.map(_.getAs[Long]("dead_frac6")).toSeq ==
      Seq(80000L, 160000L, 47619L))
    assert(sheet.map(_.getAs[Long]("tomb_outstanding")).toSeq ==
      Seq(8L, 0L, 4L))
    // live stats are vacuum-invariant: wave 3's live row set is
    // keys 21..100 regardless of the wave-2 rewrite
    assert(sheet(2).getAs[Long]("rows_live") == 80L)
    assert(sheet(2).getAs[Long]("chk1_live") ==
      (21L to 100L).map(_ * 7).sum)
  }

  test("q215 wave audit: wave-order invariance and final state ≡ rebuild over corpus − ∪D") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val dp = StreamingQueries.docPostingsOf(docs)
      .select($"doc_id".as("key"), $"term".as("k"),
        ($"doc_id" * $"tf").as("c1"), $"tf".as("c2"))
      .localCheckpoint(true)
    val hexOf = StreamingQueries.Takedown.waveHex($"doc_id")
    val waves = StreamingQueries.Takedown.Waves.map(h =>
      docs.filter(hexOf === h).select($"doc_id".as("key"))
        .localCheckpoint(true))
    def lastRow(ws: Seq[org.apache.spark.sql.DataFrame]) =
      StreamingQueries.tombstoneWaveAudit("t", dp, ws, "key",
          tmpDir("graft_waveorder"))
        .orderBy($"wave".desc).limit(1)
        .select($"rows_live", $"keys_live", $"chk1_live", $"chk2_live")
        .head()
    val fwd = lastRow(waves)
    // tombstones are final and the purge is an anti-join, so the
    // final live state is invariant under wave arrival order — even
    // though the vacuum may fire at a DIFFERENT wave per order
    assert(fwd == lastRow(waves.reverse))
    // and ≡ a from-scratch rebuild over corpus − (D1 ∪ D2 ∪ D3)
    val kept = docs.filter(
      !hexOf.isin(StreamingQueries.Takedown.Waves: _*))
    val rb = StreamingQueries.docPostingsOf(kept)
      .agg(count(lit(1)), countDistinct($"term"),
        sum($"doc_id" * $"tf"), sum($"tf")).head()
    assert(fwd.getLong(0) == rb.getLong(0) &&
      fwd.getLong(1) == rb.getLong(1) &&
      fwd.getLong(2) == rb.getLong(2) &&
      fwd.getLong(3) == rb.getLong(3))
    assert(fwd.getLong(0) > 0)
  }

  private def interleaveRows(ks: Seq[Long]) = {
    import spark.implicits._
    ks.toDF("key")
      .select($"key", concat(lit("k"), $"key").as("k"),
        ($"key" * 7).as("c1"), ($"key" % 5).as("c2"))
  }

  test("q220 interleaved audit: ingest screen, planted threshold, both vacuum branches") {
    import spark.implicits._
    // base keys 1..100; A1 appends 101..150; D1 takes 12 of 150 (8%
    // — under the 10% threshold); A2 appends 151..180 PLUS four
    // already-taken-down keys (1..4) that the ingest screen must
    // drop; D2 takes 15 more (27/180 = 15% — fires). The audit must
    // show the dead fraction shrinking under the append and the
    // vacuum firing exactly once, and rows_total at wave 3 must be
    // 180, not 184 — a leaked screen re-admits deleted keys.
    val events = Seq(
      "append" -> interleaveRows(101L to 150L),
      "takedown" -> ((1L to 8L) ++ (101L to 104L)).toDF("key"),
      "append" -> interleaveRows((151L to 180L) ++ (1L to 4L)),
      "takedown" -> ((9L to 20L) ++ (105L to 107L)).toDF("key"))
    val sheet = StreamingQueries.interleavedWaveAudit("t",
        interleaveRows(1L to 100L), events, "key",
        tmpDir("graft_ivspec"))
      .orderBy($"wave").collect()
    assert(sheet.map(_.getAs[String]("kind")).toSeq ==
      Seq("append", "takedown", "append", "takedown"))
    assert(sheet.map(_.getAs[Long]("rows_total")).toSeq ==
      Seq(150L, 150L, 180L, 180L))
    assert(sheet.map(_.getAs[Long]("rows_dead")).toSeq ==
      Seq(0L, 12L, 12L, 27L))
    assert(sheet.map(_.getAs[Long]("dead_frac6")).toSeq ==
      Seq(0L, 80000L, 66666L, 150000L))
    assert(sheet.map(_.getAs[Boolean]("vacuumed")).toSeq ==
      Seq(false, false, false, true))
    assert(sheet.map(_.getAs[Long]("tomb_outstanding")).toSeq ==
      Seq(0L, 12L, 12L, 0L))
    // final live = (21..100) ∪ (108..150) ∪ (151..180)
    val liveKeys = (21L to 100L) ++ (108L to 150L) ++ (151L to 180L)
    assert(sheet(3).getAs[Long]("rows_live") == liveKeys.size.toLong)
    assert(sheet(3).getAs[Long]("keys_live") == liveKeys.size.toLong)
    assert(sheet(3).getAs[Long]("chk1_live") == liveKeys.map(_ * 7).sum)
    assert(sheet(3).getAs[Long]("chk2_live") == liveKeys.map(_ % 5).sum)
  }

  test("q220 interleaved audit: a key appended twice keeps both rows; takedown kills both") {
    import spark.implicits._
    // the r18 one-pass fold tags rows with (append event, takedown
    // event) instead of folding per event — pin its multiplicity
    // semantics: a key present in base AND re-appended (never taken
    // down before the append, so the screen must NOT drop it)
    // contributes one row per append, and a later takedown kills all
    // of its rows at once.
    val events = Seq(
      "append" -> interleaveRows(Seq(1L, 101L)), // key 1 again (live)
      "takedown" -> Seq(1L).toDF("key"),         // kills BOTH rows of 1
      "append" -> interleaveRows(Seq(102L)),
      "takedown" -> Seq(103L).toDF("key"))       // not present: no-op
    val sheet = StreamingQueries.interleavedWaveAudit("t",
        interleaveRows(1L to 10L), events, "key",
        tmpDir("graft_ivdup"))
      .orderBy($"wave").collect()
    assert(sheet.map(_.getAs[Long]("rows_total")).toSeq ==
      Seq(12L, 12L, 11L, 11L))
    // wave 2: both rows of key 1 (base + re-append) are dead = 2/12
    // (16.7% > threshold -> vacuum fires and retires them)
    assert(sheet.map(_.getAs[Long]("rows_dead")).toSeq ==
      Seq(0L, 2L, 0L, 0L))
    assert(sheet.map(_.getAs[Boolean]("vacuumed")).toSeq ==
      Seq(false, true, false, false))
    assert(sheet.map(_.getAs[Long]("tomb_outstanding")).toSeq ==
      Seq(0L, 0L, 0L, 1L))
    assert(sheet(3).getAs[Long]("rows_live") == 11L)
    assert(sheet(3).getAs[Long]("keys_live") == 11L)
    assert(sheet(3).getAs[Long]("chk1_live") ==
      ((2L to 10L) ++ Seq(101L, 102L)).map(_ * 7).sum)
  }

  test("q220: event-order matrix — A-D-A-D and D-A-D-A converge to the same final live state") {
    import spark.implicits._
    // takedowns are forever (ingest screen + anti-join), so the final
    // live state is order-invariant even though WHICH event fires the
    // vacuum differs per order (D-A-D-A fires at its third event,
    // A-D-A-D at its fourth).
    val base = interleaveRows(1L to 100L)
    val a1 = interleaveRows(101L to 150L)
    val a2 = interleaveRows((151L to 180L) ++ (1L to 4L))
    val d1 = ((1L to 8L) ++ (101L to 104L)).toDF("key")
    val d2 = ((9L to 20L) ++ (105L to 107L)).toDF("key")
    def finalRow(events: Seq[(String, org.apache.spark.sql.DataFrame)]) =
      StreamingQueries.interleavedWaveAudit("t", base, events, "key",
          tmpDir("graft_ivorder"))
        .orderBy($"wave".desc).limit(1)
        .select($"rows_live", $"keys_live", $"chk1_live", $"chk2_live")
        .head()
    val adad = finalRow(Seq("append" -> a1, "takedown" -> d1,
      "append" -> a2, "takedown" -> d2))
    val dada = finalRow(Seq("takedown" -> d1, "append" -> a1,
      "takedown" -> d2, "append" -> a2))
    assert(adad == dada)
    assert(adad.getLong(0) > 0)
  }
}
