package graft

import graft.queries.Registry

/** Pins for q140, the streaming near-dup dedup-at-ingest gate:
  *  - planted-near-dup RECALL: a corpus with known (new, indexed)
  *    near-dup pairs straddling the ingest split must surface nearly
  *    all of them through the streamed band join (the quality contract
  *    of the at-ingest screen, mirroring LshRecallSpec's batch pin);
  *  - precision 1 by construction (in-stream exact-Jaccard verify);
  *  - consistency with the batch pipeline: on shared testdata the
  *    streamed result is exactly q42's verified pair set restricted to
  *    pairs straddling the split — the streaming twin computes the
  *    same answer as the batch gate it mirrors.
  */
class StreamIngestDedupSpec extends SparkSpec {

  private def md5hex2(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    f"${d(0) & 0xFF}%02x"
  }
  private def isNew(id: Long): Boolean = md5hex2(s"ingest:$id") < "55"

  test("q140 finds planted cross-split near-dups (recall >= 0.9)") {
    import spark.implicits._
    // pick doc_ids landing on each side of the deterministic split
    val corpusIds = Iterator.from(0).map(_.toLong).filter(!isNew(_)).take(20).toSeq
    val newIds = Iterator.from(10000).map(_.toLong).filter(isNew).take(20).toSeq
    // base docs with per-doc-unique tokens (no cross-pair shingle
    // overlap); each "new" doc is its base with ONE mid token edited —
    // 28 shingles, 25 shared, J = 25/31 ≈ 0.81 >= 0.7
    def baseText(i: Int) = (0 until 30).map(j => s"t${i}x$j").mkString(" ")
    def dupText(i: Int) =
      (0 until 30).map(j => if (j == 15) s"EDIT$i" else s"t${i}x$j").mkString(" ")
    val rows =
      corpusIds.zipWithIndex.map { case (id, i) =>
        (id, baseText(i), "en", "planted", baseText(i).length.toLong) } ++
      newIds.zipWithIndex.map { case (id, i) =>
        (id, dupText(i), "en", "planted", dupText(i).length.toLong) }
    val dir = tmpDir("graft_q140_spec")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Registry.byName("q140_stream_ingest_dedup").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision: every emitted pair is a verified true near-dup
    got.foreach { case (_, _, j) => assert(j >= 0.7, s"jaccard $j < 0.7") }
    // recall over the planted pairs: banded LSH at J ≈ 0.81 detects
    // with p = 1 − (1 − J²)⁴ ≈ 0.99 per pair; deterministic here
    val planted = newIds.zip(corpusIds).toSet
    val foundPairs = got.map(g => (g._1, g._2)).toSet
    val recall = planted.count(foundPairs.contains).toDouble / planted.size
    assert(recall >= 0.9, s"planted recall $recall ($foundPairs)")
  }

  test("q140 equals batch q42 pairs restricted to cross-split (sf0.001)") {
    val stream = Registry.byName("q140_stream_ingest_dedup").run(spark, sf)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val batch = Registry.byName("q42_lsh_neardup").run(spark, sf)
      .collect()
      .filter(r => isNew(r.getLong(0)) != isNew(r.getLong(1)))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stream.nonEmpty, "no cross-split near-dup pairs at sf0.001")
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("bucketed band index: static sides join SHUFFLE-FREE, same matches") {
    // the q140 comment's 100 TB claim as a locked plan shape: both
    // static lookups persisted bucketed on their join keys, broadcast
    // disabled, and the last micro-batch's physical plan must show
    // (a) two bucketed scans actually selected as bucketed reads, and
    // (b) exchanges ONLY on the stream side — with unbucketed static
    // sides this plan carries 4 hash exchanges (each join shuffles
    // both sides), with bucketing exactly the 2 stream-side ones.
    val (matches, planFull) =
      graft.queries.StreamingQueries.q140BucketedDemo(spark, sf)
    // AQE explain repeats the tree as Final + Initial plan — assert on
    // the executed (final) section only
    val plan = planFull.split("== Initial Plan ==").head
    val bucketedScans =
      "Bucketed: true".r.findAllIn(plan).length
    assert(bucketedScans == 2, s"expected 2 bucketed scans:\n$plan")
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"expected only the 2 stream-side exchanges, got $exchanges:\n$plan")
    // and the co-located shape computes the identical answer
    val got = matches.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Registry.byName("q140_stream_ingest_dedup").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"bucketed matches $got vs q140 $want")
  }
}
