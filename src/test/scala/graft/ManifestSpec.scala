package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.queries.StreamingQueries

/** The manifest-logged artifact family (q221/q222), pinned on planted
  * timelines where every snapshot is hand-computable: time travel
  * across a fired vacuum, OPTIMIZE as a logical no-op that shrinks the
  * visible file set, the ingest screen at the manifest layer, CDC
  * replay reconstructing the head state, snapshot expiry failing
  * loudly, and both decision bits in both directions. */
class ManifestSpec extends SparkSpec {

  import StreamingQueries.{ManRow, buildOneManifest, snapshotAt,
    snapshotFiles, expireSnapshots}

  private def rowsDf(keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.map(k => (k, s"t$k", k * 10L, k)).toDF("key", "k", "c1", "c2")
  }

  private def tombDf(keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.map(k => Tuple1(k)).toDF("key")
  }

  /** planted timeline: base 1..10, A1 11..14, D1 {1} (7.1% < 10%, no
    * vacuum), A2 {1, 15, 16} (key 1 re-add SCREENED), OPTIMIZE (debt
    * 6/16 = 37.5%, fires), D2 {2, 3} (dead 3/16 = 18.75%, vacuum
    * fires). */
  private def plantTimeline(): (String, Seq[ManRow]) = {
    val out = tmpDir("graft_manspec")
    val events = Seq(
      "append" -> rowsDf(11L to 14L),
      "takedown" -> tombDf(Seq(1L)),
      "append" -> rowsDf(Seq(1L, 15L, 16L)),
      "optimize" -> (null: DataFrame),
      "takedown" -> tombDf(Seq(2L, 3L)))
    val entries = buildOneManifest(spark, "t", rowsDf(1L to 10L),
      events, "key", out)
    import spark.implicits._
    entries.toDF("artifact", "version", "kind", "action", "file_kind",
        "cause", "path", "n_rows")
      .repartition(1).write.mode("overwrite").parquet(s"$out/manifest")
    (out, StreamingQueries.manifestRowsOf(spark, out))
  }

  private def snapMetrics(man: Seq[ManRow], v: Long)
      : (Long, Long, Set[Long]) = {
    val snap = snapshotAt(spark, man, "t", v).localCheckpoint(true)
    val total = snap.count()
    val dead = snap.filter(col("dd") === 1).count()
    val liveKeys = snap.filter(col("dd").isNull)
      .select("key").collect().map(_.getLong(0)).toSet
    (total, dead, liveKeys)
  }

  test("planted timeline: every snapshot matches the hand-rolled state; vacuum and OPTIMIZE fire where expected") {
    val (_, man) = plantTimeline()
    assert(snapMetrics(man, 0) == ((10L, 0L, (1L to 10L).toSet)))
    assert(snapMetrics(man, 1) == ((14L, 0L, (1L to 14L).toSet)))
    // D1 at 1/14 = 7.1% — below the 10% threshold, no vacuum
    assert(snapMetrics(man, 2) == ((14L, 1L, (2L to 14L).toSet)))
    assert(!man.exists(m => m.version == 2 && m.cause == "vacuum"))
    // key 1's re-add is screened at ingest; only 15, 16 enter
    assert(snapMetrics(man, 3) ==
      ((16L, 1L, ((2L to 16L).toSet))))
    // OPTIMIZE fires (debt 6/16 = 37.5%): 3 visible data files -> 1,
    // logical state identical to v3
    assert(man.exists(m => m.version == 4 && m.action == "add" &&
      m.cause == "optimize"))
    assert(snapshotFiles(man, "t", 3, "data").size == 3)
    assert(snapshotFiles(man, "t", 4, "data").size == 1)
    assert(snapMetrics(man, 4) == snapMetrics(man, 3))
    // D2 pushes dead to 3/16 = 18.75% — vacuum fires, tombs retired
    assert(man.exists(m => m.version == 5 && m.action == "add" &&
      m.cause == "vacuum"))
    assert(snapMetrics(man, 5) ==
      ((13L, 0L, ((4L to 16L).toSet))))
    assert(snapshotFiles(man, "t", 5, "tomb").isEmpty)
  }

  test("time travel: pre-vacuum and pre-OPTIMIZE versions stay readable AFTER the swaps") {
    val (_, man) = plantTimeline()
    // read v2 and v3 AFTER the v4 compaction and v5 vacuum rewrote
    // the file set — the log keeps the old files visible at their
    // own versions
    assert(snapMetrics(man, 2) == ((14L, 1L, (2L to 14L).toSet)))
    assert(snapMetrics(man, 3) == ((16L, 1L, (2L to 16L).toSet)))
  }

  test("CDC replay over the planted timeline reconstructs the head state") {
    val (_, man) = plantTimeline()
    // logical adds/removes per commit, derived the same way q222
    // publishes them; replaying them from the base set must land on
    // the head snapshot's live keys
    var live = (1L to 10L).toSet
    live ++= Set(11L, 12L, 13L, 14L) // v1 adds
    live --= Set(1L) // v2 removes
    live ++= Set(15L, 16L) // v3 adds (1 screened)
    // v4 OPTIMIZE: zero CDC
    live --= Set(2L, 3L) // v5 removes
    assert(snapMetrics(man, 5)._3 == live)
  }

  test("a fully-screened (empty) append commit stays readable") {
    val out = tmpDir("graft_manspec_empty")
    val events = Seq(
      "takedown" -> tombDf(Seq(1L)),
      "append" -> rowsDf(Seq(1L))) // only a re-add of the dead key
    val entries = buildOneManifest(spark, "t", rowsDf(1L to 4L),
      events, "key", out)
    import spark.implicits._
    entries.toDF("artifact", "version", "kind", "action", "file_kind",
        "cause", "path", "n_rows")
      .repartition(1).write.mode("overwrite").parquet(s"$out/manifest")
    val man = StreamingQueries.manifestRowsOf(spark, out)
    val add = man.find(m => m.version == 2 && m.action == "add")
    assert(add.exists(_.nRows == 0L), s"screened append should be empty: $add")
    // (D1 at 1/4 = 25% fires the v1 vacuum, so v2 = 3 clean rows +
    // the empty append file) — the empty file participates in the
    // union without breaking reads
    assert(snapMetrics(man, 2) == ((3L, 0L, Set(2L, 3L, 4L))))
  }

  test("decision bits do NOT fire below their thresholds") {
    val out = tmpDir("graft_manspec_low")
    val events = Seq(
      "append" -> rowsDf(Seq(101L)), // debt 1/101 < 10%
      "takedown" -> tombDf(Seq(1L, 2L)), // dead 2/101 < 10%
      "optimize" -> (null: DataFrame))
    val entries = buildOneManifest(spark, "t", rowsDf(1L to 100L),
      events, "key", out)
    assert(!entries.exists(e => e._6 == "vacuum"),
      "vacuum fired below threshold")
    assert(!entries.exists(e => e._6 == "optimize"),
      "OPTIMIZE fired below threshold")
    // the unfired OPTIMIZE still records its commit marker
    assert(entries.exists(e => e._2 == 3L && e._4 == "commit" &&
      e._3 == "optimize"))
  }

  test("expireSnapshots deletes below the horizon, keeps the rest, and expired reads fail loudly") {
    val (out, man) = plantTimeline()
    expireSnapshots(spark, out, keepFrom = 4L)
    val man2 = StreamingQueries.manifestRowsOf(spark, out)
    // versions >= the horizon read exactly what they read before
    assert(snapMetrics(man2, 4) == ((16L, 1L, (2L to 16L).toSet)))
    assert(snapMetrics(man2, 5) == ((13L, 0L, (4L to 16L).toSet)))
    // versions below the horizon fail loudly, not partially
    val e = intercept[IllegalArgumentException](
      snapshotAt(spark, man2, "t", 1))
    assert(e.getMessage.contains("expired"))
  }

  test("incremental MV fold ≡ per-version recompute, ROW FOR ROW, on the planted timeline") {
    val (_, man) = plantTimeline()
    def rowsOf(df: DataFrame): Set[(String, Long, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val folds = StreamingQueries.mvFold(spark, man, "t")
    assert(folds.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    for ((v, _, touched, mv) <- folds) {
      // the recompute: that version's snapshot, live rows, grouped
      val direct = snapshotAt(spark, man, "t", v)
        .filter(col("dd").isNull)
        .groupBy(col("k")).agg(count(lit(1)).as("n"),
          sum(col("c1")).as("s1"), sum(col("c2")).as("s2"))
      assert(rowsOf(mv.select("k", "n", "s1", "s2")) == rowsOf(direct),
        s"MV diverged from recompute at v$v")
      // the OPTIMIZE commit touches nothing; every other commit > v0
      // touches exactly its delta's key set
      if (v == 4L || v == 0L) assert(touched == 0L)
      else assert(touched > 0L)
    }
    // planted sparsity: D2 removes keys {2,3} -> exactly 2 view rows
    // touched while the view holds 13 (the IVM economy)
    assert(folds.last._3 == 2L)
  }

  test("q221/q222 registry gates: sheet shapes, decision bits, CDC-vs-snapshot conservation at sf") {
    import spark.implicits._
    val tt = graft.queries.Registry.byName("q221_time_travel")
      .run(spark, sf).localCheckpoint(true)
    val cdc = graft.queries.Registry.byName("q222_cdc_feed")
      .run(spark, sf).localCheckpoint(true)
    assert(tt.count() == 18) // 3 artifacts x 6 versions
    assert(cdc.count() == 15) // 3 artifacts x 5 commits
    // per (artifact, version): live conservation inside the sheet
    assert(tt.filter($"rows_live" =!=
      $"rows_present" - $"rows_dead").count() == 0)
    // CDC telescopes: rows_live(head) = rows_live(base) + sum(adds)
    // - sum(removes), per artifact
    val head = tt.filter($"version" === 5)
      .select($"artifact", $"rows_live").as[(String, Long)]
      .collect().toMap
    val base = tt.filter($"version" === 0)
      .select($"artifact", $"rows_live").as[(String, Long)]
      .collect().toMap
    val net = cdc.groupBy($"artifact")
      .agg(sum($"rows_added" - $"rows_removed").as("net"))
      .as[(String, Long)].collect().toMap
    for ((a, h) <- head)
      assert(h == base(a) + net(a),
        s"$a: head $h != base ${base(a)} + net ${net(a)}")
    // every artifact's OPTIMIZE commit carries the debt input and the
    // fired bit on this corpus (appends are ~1/3 of rows >> 10%)
    val opt = tt.filter($"version" === 4)
    assert(opt.filter($"optimized" && $"debt_frac6" > 100000L)
      .count() == 3)
    // and D2 fires the vacuum on all three (the q220-measured ~14%)
    assert(tt.filter($"version" === 5)
      .filter($"vacuumed" && $"rows_dead" === 0L).count() == 3)
    // q223: the maintained view's digest must agree with q221's live
    // checksums at EVERY (artifact, version) — IVM ≡ snapshot reads
    val mv = graft.queries.Registry.byName("q223_mv_maintain")
      .run(spark, sf).localCheckpoint(true)
    assert(mv.count() == 18)
    val joined = mv.join(tt, Seq("artifact", "version"))
    assert(joined.count() == 18)
    assert(joined.filter($"mv_chk1" =!= $"chk1_live" ||
      $"mv_chk2" =!= $"chk2_live" ||
      $"mv_rows" =!= $"keys_live").count() == 0)
  }
}
