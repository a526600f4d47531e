package graft

import graft.queries.TextQueries

/** Pins for q131's hierarchical shard packing: the bounded two-level
  * prefix-sum (per-(lang, md5-hex-bucket) cumsum + bucket token
  * offsets) must produce the EXACT per-doc assignment of the flat
  * one-window reference form — the offset decomposition is integer
  * arithmetic, so equality is bitwise, not approximate. Verified on
  * real corpora at two SFs so bucket boundaries actually fall inside
  * shards (the case where a naive per-bucket restart would diverge).
  */
class ShardPackSpec extends SparkSpec {

  private def assignments(dir: String, hierarchical: Boolean,
      prefixLen: Int = 1) =
    TextQueries.packShardsOf(
        spark.read.parquet(s"$dir/documents.parquet"), hierarchical, prefixLen)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("data precondition: no document exceeds the shard budget") {
    // the shard-id contiguity assertion below (and q131's fill_ratio)
    // assume next-fit never SKIPS a shard, which holds iff every doc
    // fits one shard (n_tok <= PackB) — assert it explicitly so a
    // regenerated corpus that violates it fails HERE, not as a
    // mysterious contiguity failure
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val mx = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(max(size(split(col("text"), " ")))).head().getInt(0)
      assert(mx <= 4096, s"$sf max n_tok $mx exceeds PackB")
    }
  }

  test("q139 manifest aggregates exactly to q131's per-language rollup") {
    import graft.queries.Registry
    val dir = "/root/testdata/sf0.01"
    val manifest = Registry.byName("q139_shard_manifest").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rollup = Registry.byName("q131_shard_packing").run(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val byLang = manifest.groupBy(_._1)
    assert(byLang.keySet == rollup.keySet)
    byLang.foreach { case (lang, rows) =>
      val (nDocs, totTok, nShards) = rollup(lang)
      assert(rows.map(_._3).sum == nDocs, s"$lang doc count")
      assert(rows.map(_._4).sum == totTok, s"$lang token sum")
      assert(rows.map(_._2).max + 1 == nShards, s"$lang shard count")
      // next-fit leaves no empty shards: ids are contiguous 0..n-1
      assert(rows.map(_._2).sorted.sameElements(0L until nShards),
        s"$lang shard ids not contiguous")
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"hierarchical == flat per-doc shard assignment at $sf") {
      val dir = s"/root/testdata/$sf"
      val flat = assignments(dir, hierarchical = false)
      val hier = assignments(dir, hierarchical = true)
      assert(hier.size == flat.size, s"${hier.size} vs ${flat.size}")
      val diffs = flat.collect {
        case (k, v) if hier(k) != v => (k, v, hier(k))
      }
      assert(diffs.isEmpty, s"first diverging docs: ${diffs.take(5).toSeq}")
      // the equality must be non-vacuous: some language must span
      // multiple buckets AND multiple shards, so a bucket boundary
      // lands mid-shard somewhere
      val shardsPerLang = flat.groupBy(_._1._1)
        .map { case (l, m) => l -> m.values.map(_._2).toSet.size }
      assert(shardsPerLang.values.exists(_ > 1),
        s"degenerate corpus: one shard per lang ($shardsPerLang)")
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"q168 hierarchical == flat per-pack manifest at $sf") {
      // the same decomposition applied to q168's GLOBAL shuffle-order
      // cumsum (no lang partition): the per-pack manifest — every
      // column, including the span checksum that pins each segment's
      // doc and length — must be bit-identical between the one-window
      // reference and the bucketed two-level form
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      def packs(h: Boolean) =
        TextQueries.packSequences(docs, hierarchical = h).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
      val flat = packs(false)
      val hier = packs(true)
      assert(flat.nonEmpty && flat.length > 1, "degenerate: <2 packs")
      assert(hier.toSeq == flat.toSeq,
        s"first diverging packs: ${hier.zip(flat).filter(p => p._1 != p._2).take(3).toSeq}")
    }
  }

  test("bucket fan-out is a free knob: P=2 (256 buckets) == P=1 == flat") {
    // the 100 TB retune — narrower per-task sorts via a longer bucket
    // prefix — must be assignment-invariant (exact integer offset
    // decomposition at any P)
    val dir = "/root/testdata/sf0.01"
    val flat = assignments(dir, hierarchical = false)
    val p2 = assignments(dir, hierarchical = true, prefixLen = 2)
    assert(p2 == flat, "P=2 assignment diverges from flat")
  }
}
