package graft

import graft.queries.{DedupQueries, Registry}

/** q189's attribution join on a planted leak: a corpus doc that
  * copies an 8-token span from a benchmark doc is attributed to that
  * doc with the exact shared-window count; clean docs are absent.
  * (The registry gate pins cross-engine equality on the real corpus;
  * this pins the SEMANTICS — which pair, which count — on inputs
  * where the right answer is computable by hand.) */
class NgramAttributionSpec extends SparkSpec {

  test("planted 8-token copy is attributed to its benchmark doc; clean docs absent") {
    import spark.implicits._
    val bench = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    val corpus = Seq(
      // copies w3..w10 — exactly ONE shared 8-gram; has 3 distinct
      // 8-grams of its own (10 tokens → windows at offsets 1..3)
      (101L, "x1 x2 w3 w4 w5 w6 w7 w8 w9 w10"),
      // same vocabulary, no 8-token run in common
      (102L, "w1 w2 w3 x9 w5 w6 w7 w8 w9 w10"),
      // too short to carry any 8-gram at all
      (103L, "w1 w2 w3")).toDF("doc_id", "text")
    val out = DedupQueries.ngramAttribution(corpus, bench, 8).collect()
    assert(out.length == 1, out.mkString("\n"))
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((101L, 1L, 1L, 3L, 333333L)), r)
  }

  test("q189 is non-vacuous on the real corpus: at least one attributed pair") {
    val rows = Registry.byName("q189_ngram_attribution").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // every reported pair crosses the split: train side ≥ 5% boundary
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(3) >= r.getLong(2)))
  }
}
