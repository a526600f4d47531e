package graft

import graft.queries.Registry

/** Cross-operator consistency: the MinHash-LSH pipeline (q42) against
  * the exact brute-force Jaccard baseline (q45). Both are
  * deterministic, so recall/precision on the test corpus are exact,
  * stable regression values — the quality contract a dedup pipeline
  * must document before trading exactness for the banded sketch.
  * Runs at sf0.01 (sf0.001 has too few near-dup pairs). */
class LshRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("q42 LSH finds the brute-force near-dup pairs (recall >= 0.9)") {
    val lsh = Registry.byName("q42_lsh_neardup").run(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q45 blocks on (lang, |token-count delta| <= 1) and anchors doc_a
    // at a fixed probe sample — a SUBSET of all true pairs, so it can
    // serve as ground truth for recall only. Probe-anchored pairs come
    // out in both directions; normalize to (min, max) like q42 emits.
    val brute = Registry.byName("q45_ngram_jaccard").run(spark, sf01)
      .collect()
      .map(r => (math.min(r.getLong(1), r.getLong(2)),
        math.max(r.getLong(1), r.getLong(2)))).toSet
    assert(brute.nonEmpty, "baseline found no near-dup pairs at sf0.01")
    val found = brute.count(lsh.contains)
    val recall = found.toDouble / brute.size
    // K=8 lanes, 4 bands of 2 rows: P(candidate | J) = 1-(1-J^2)^4,
    // >= 0.996 at J = 0.7 — recall on this corpus should be near 1
    assert(recall >= 0.9, s"LSH recall $recall ($found/${brute.size})")
  }

  test("q42 pairs are all verified true near-dups (precision = 1)") {
    val lsh = Registry.byName("q42_lsh_neardup").run(spark, sf01).collect()
    // the pipeline exact-verifies candidates, so every emitted pair
    // must carry jaccard >= 0.7 — precision is 1 by construction
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getDouble(2) >= 0.7))
  }
}
