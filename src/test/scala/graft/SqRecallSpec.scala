package graft

import graft.queries.Registry

/** q190's quantization-quality pin: SQ8 (int8 symmetric dot,
  * shortlist 32, exact re-rank to 5) must recover nearly all of the
  * brute-force top-5 — int8 over 64-dim unit vectors loses ~1e-2
  * per-component precision, far below the corpus's neighbor score
  * gaps, so a recall drop here means the encode or the scoring
  * changed, not the data. */
class SqRecallSpec extends SparkSpec {

  test("SQ8 + exact re-rank recall@5 ≥ 0.9 vs brute cosine") {
    val dir = sf
    def top5(name: String) = Registry.byName(name).run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = top5("q190_sq8_ann")
    val brute = top5("q50_knn_brute")
    // the ANN sample is a prefix of the brute sample — every SQ query
    // has ground truth
    assert(sq.keySet.subsetOf(brute.keySet), sq.keySet.diff(brute.keySet))
    val recalls = sq.map { case (q, ns) =>
      (brute(q).intersect(ns).size.toDouble / 5.0)
    }
    val macroRecall = recalls.sum / recalls.size
    assert(macroRecall >= 0.9, s"recall@5 = $macroRecall per-q $recalls")
  }
}
