package graft

import graft.queries.SimilarityQueries

/** q182 non-vacuity: the chunk-granularity ranker must retrieve a
  * relevant PASSAGE buried inside an otherwise-irrelevant long
  * document — the case doc-level BM25 structurally mishandles (the
  * passage's tf is diluted by the host document's length
  * normalization, and the packed context would drag in the whole
  * off-topic document). */
class ChunkRetrievalSpec extends SparkSpec {

  test("a relevant chunk inside an irrelevant long doc wins at chunk granularity") {
    import spark.implicits._
    val filler = (0 until 192).map(i => s"f${i % 37}")
    val planted = Seq("zebra", "quantum", "lattice", "krypton", "vortex")
    // the distinctive run sits at tokens 150..154 of a 192-token doc —
    // inside the 3rd/4th overlapping windows, nowhere near the doc head
    val longDoc = (filler.take(150) ++ planted ++ filler.drop(155))
      .mkString(" ")
    val qDoc = (planted ++ planted ++ Seq("query", "doc")).mkString(" ")
    val docs = Seq(
      (1L, longDoc),
      (2L, (0 until 100).map(i => s"g${i % 23}").mkString(" ")),
      (3L, (0 until 80).map(i => s"h${i % 19}").mkString(" ")),
      (100L, qDoc)).toDF("doc_id", "text")
    val qids = Seq(100L).toDF("q_id")
    val ranked = SimilarityQueries.chunkRank(spark, docs, qids).collect()
      .sortBy(_.getInt(1))
    assert(ranked.nonEmpty, "no chunks ranked")
    val top = ranked.head
    assert(top.getLong(2) == 1L, s"top chunk not from the long doc: $top")
    val start = top.getLong(3) * 48
    assert(start <= 150 && 150 < start + 64,
      s"top chunk window [$start, ${start + 64}) misses the planted run: $top")
    // chunks of the long doc NOT covering the planted run must not
    // outrank the covering ones — the score is passage-local
    val misses = ranked.filter(r => r.getLong(2) == 1L && {
      val s0 = r.getLong(3) * 48; !(s0 <= 150 && 150 < s0 + 64)
    })
    misses.foreach(m => assert(m.getInt(1) > top.getInt(1), m.toString))
  }
}
