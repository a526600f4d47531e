package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** The IVFADC index-persistence contract behind PERF.md's q172 note:
  * the corpus encode (vec_id, cell, codes) is a one-time artifact; a
  * deployment persists it PARTITIONED BY CELL, and probing nprobe
  * cells then reads only those partitions — partition pruning, not a
  * full index scan. Proven here with a real write + real reader scan
  * metrics (the ZorderSpec write-path discipline). */
class AnnIndexSpec extends SparkSpec {

  test("cell-partitioned index: a probe scans only the probed cells") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val idx = SimilarityQueries.ivfadcIndex(spark, dir)
      .localCheckpoint(true)
    val total = idx.count()
    val perCell = idx.groupBy($"cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCell.size > 4, s"degenerate cell layout: $perCell")
    val probed = perCell.keys.toSeq.sorted.take(3)
    val expectRows = probed.map(perCell).sum
    val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      idx.write.partitionBy("cell").parquet(s"$out/index")
      val probe = spark.read.parquet(s"$out/index")
        .filter($"cell".isin(probed.map(Integer.valueOf): _*))
      val n = probe.collect().length.toLong
      assert(n == expectRows, s"probe rows $n vs $expectRows")
      // the cell predicate must prune PARTITIONS (reader-level), not
      // filter rows post-scan: the scan's own output is exactly the
      // probed cells' rows, a strict subset of the index
      val plan = probe.queryExecution.executedPlan
      val scan = plan.collectLeaves()
        .find(_.nodeName.contains("Scan")).get
      assert(plan.toString.contains("PartitionFilters"),
        plan.toString.take(1200))
      val scanned = scan.metrics("numOutputRows").value
      assert(scanned == expectRows,
        s"scan emitted $scanned rows — pruning did not reach the reader")
      assert(scanned * 2 < total,
        s"probe read $scanned of $total rows — no material skip")
      // round trip fidelity: the persisted codes are byte-identical
      val back = spark.read.parquet(s"$out/index")
        .select($"vec_id", $"cell", $"codes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
      val want = idx.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
      assert(back == want, "index round trip diverged")
    } finally {
      Scratch.deleteRecursively(new java.io.File(out))
    }
  }

  test("q181 (served from the persisted index) ≡ q172 (inline build), row for row") {
    // the serving path must change WHERE the codes come from, never
    // the ranking: same codebook sample, same rounding, same
    // tie-breaks — so the fused top-5 lists are identical artifacts
    val dir = "/root/testdata/sf0.01"
    def rows(name: String) = graft.queries.Registry.byName(name)
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(rows("q181_index_served_hybrid") == rows("q172_ann_hybrid"))
  }
}
