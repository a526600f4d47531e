package graft

import graft.queries.Registry

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
}
