package graft

import graft.queries.{Registry, StreamingQueries}

/** q186 served ≡ q182 inline: the persisted chunk postings index
  * (denormalized dl, dictionary df, 1-row stats) must change WHERE
  * the counts come from, never the ranking — same probe terms, same
  * micro-unit BM25, same packing. */
class ChunkIndexSpec extends SparkSpec {

  test("q186 (served from the postings index) ≡ q182 (inline build), row for row") {
    val dir = "/root/testdata/sf0.01"
    def rows(name: String) = Registry.byName(name).run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7))).toSeq
    assert(rows("q186_indexed_chunk_rag") == rows("q182_chunk_rag"))
  }

  test("q187 (every stage served) ≡ q185 (inline chunk build), row for row") {
    // the fully-served composition must be a pure WHERE-the-bytes-
    // come-from change: persisted ANN shortlist + persisted postings
    // (restricted to the shortlist docs) + persisted manifest produce
    // exactly q185's dual-rank manifest — restriction before scoring
    // is sound because every score term (df, n, toktot, dl) is an
    // index-time artifact, not a function of the candidate set
    val dir = "/root/testdata/sf0.01"
    def rows(name: String) = Registry.byName(name).run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7),
        r.getLong(8))).toSeq
    assert(rows("q187_fully_served_rag") == rows("q185_ann_chunk_rag"))
  }

  test("q188: streamed chunk-postings deltas ≡ the persisted q186 postings artifact, row for row") {
    // the gate hashes a per-term rollup; this pins the underlying
    // claim inside Spark — every streamed (doc, chunk, term, tf, dl)
    // posting matches the batch artifact q186 serves from, so a
    // compensating-error rollup collision can't hide a chunker or
    // tokenizer divergence between the ingest and batch paths
    import org.apache.spark.sql.streaming.Trigger
    val dir = sf
    val scratch = tmpDir("graft_q188spec")
    val q = StreamingQueries.chunkIndexDeltas(spark, dir)
      .writeStream.format("parquet")
      .option("path", s"$scratch/sink")
      .option("checkpointLocation", s"$scratch/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val streamed = rows(spark.read.parquet(s"$scratch/sink")
      .select("doc_id", "chunk_idx", "term", "tf", "dl"))
    val idx = graft.queries.SimilarityQueries.chunkIndexDir(spark, dir)
    val batch = rows(spark.read.parquet(s"$idx/postings")
      .select("doc_id", "chunk_idx", "term", "tf", "dl"))
    assert(streamed == batch,
      s"stream/batch chunk index diverged: ${streamed.diff(batch).take(3)}" +
        s" vs ${batch.diff(streamed).take(3)}")
  }
}
