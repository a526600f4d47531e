package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Structural pins for q155 overlapping-window chunking: the layout
  * invariants a downstream RAG indexer or packer relies on, checked
  * per-document over the real corpus (not just the DuckDB hash). */
class ChunkSpec extends SparkSpec {

  test("q155 chunks tile every document: coverage, stride, tail reach") {
    import spark.implicits._
    val W = 64L
    val S = 48L
    val chunks = Registry.byName("q155_chunk_windows").run(spark, sf)
    val toks = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))

    val audit = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min($"start_tok").as("first_start"),
        max($"start_tok" + $"chunk_len").as("max_reach"),
        max($"start_tok").as("last_start"),
        min($"chunk_len").as("min_len"),
        // strides are uniform: every start is a multiple of S and the
        // max index step equals S (checked via distinct start count)
        countDistinct($"start_tok").as("n_starts"))
      .join(toks, "doc_id")
      .collect()

    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (nTok, nChunks) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_chunks"))
      val expected = math.max(1L,
        math.ceil((nTok - W).toDouble / S).toLong + 1)
      assert(nChunks == expected, s"doc ${r.getAs[Long]("doc_id")}: " +
        s"$nChunks chunks for $nTok tokens, expected $expected")
      // chunk 0 starts at 0; the LAST chunk reaches the final token
      assert(r.getAs[Long]("first_start") == 0L)
      assert(r.getAs[Long]("max_reach") == nTok,
        s"doc ${r.getAs[Long]("doc_id")}: reach ${r.getAs[Long]("max_reach")} != $nTok")
      // every start < n_tok (no empty chunks), all starts distinct
      assert(r.getAs[Long]("last_start") < nTok)
      assert(r.getAs[Long]("min_len") >= 1L)
      assert(r.getAs[Long]("n_starts") == nChunks)
    }
  }

  test("q155 emits the exact expected chunk hashes on a planted doc") {
    // 150 tokens → starts 0, 48, 96; the emitted md5s must equal the
    // locally-computed hashes of those exact slices (tail truncated)
    import spark.implicits._
    val toks = (0 until 150).map(i => s"t$i")
    val dir = Scratch.tempDirDeletedOnExit("graft_chunk_plant")
    Seq((1L, toks.mkString(" "), "en", "plant", toks.mkString(" ").length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val got = Registry.byName("q155_chunk_windows").run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_md5")))
    val expected = Seq(
      (0L, 0L, 64L, md5hex(toks.slice(0, 64).mkString(" "))),
      (1L, 48L, 64L, md5hex(toks.slice(48, 112).mkString(" "))),
      (2L, 96L, 54L, md5hex(toks.slice(96, 150).mkString(" "))))
    assert(got.toSeq == expected, got.toSeq.toString)
  }
  test("q168 packs are exactly full, cover every token once, and stay contiguous") {
    import spark.implicits._
    val Ctx = 1024L
    val packs = Registry.byName("q168_sequence_packing").run(spark, sf)
      .collect().sortBy(_.getAs[Long]("pack_id"))
    assert(packs.nonEmpty)
    val totalTok = graft.Tables.documents(spark, sf)
      .select(sum(size(split($"text", " ")).cast("long"))).head.getLong(0)
    // pack ids are 0..N-1 with no gaps
    assert(packs.map(_.getAs[Long]("pack_id")).toSeq ==
      packs.indices.map(_.toLong))
    // every pack except the last is exactly full; fills sum to the
    // corpus token count (each token lands in exactly one segment)
    packs.init.foreach(r =>
      assert(r.getAs[Long]("fill") == Ctx, r.toString))
    assert(packs.last.getAs[Long]("fill") <= Ctx)
    assert(packs.map(_.getAs[Long]("fill")).sum == totalTok)
    // a pack holds at least one segment and its doc span is sane
    packs.foreach { r =>
      assert(r.getAs[Long]("n_segs") >= 1L)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
  }

}
