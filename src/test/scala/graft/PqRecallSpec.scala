package graft

import graft.queries.Registry

/** PQ ANN quality contract: q114 (PQ16 codes → ADC shortlist-100 →
  * exact re-rank) against the exact brute-force top-5 (q50) for the
  * shared md5 query sample. Because the re-rank step scores the
  * shortlist with the exact metric, final recall@5 equals shortlist
  * recall — the single number the PQ_R knob buys. Measured on this
  * near-orthogonal corpus: 0.89 (ADC-only top-5, with no re-rank, is
  * 0.075 — the re-rank stage is load-bearing, not a nicety; that
  * comparison is why q114 ships the IVFADC pipeline shape). */
class PqRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("native graft_pq_encode equals the interpreted HOF spelling") {
    import graft.queries.SimilarityQueries
    val native = SimilarityQueries.pqEncode(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = SimilarityQueries.pqEncodeHof(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.nonEmpty && native.keySet == hof.keySet)
    native.foreach { case (id, codes) =>
      assert(codes == hof(id), s"codes diverge for vec_id $id")
    }
  }

  private lazy val brute: Map[Long, Set[Long]] =
    Registry.byName("q50_knn_brute").run(spark, sf01).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }

  private def recallAt5(queryName: String): Double = {
    val ann = Registry.byName(queryName).run(spark, sf01).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // the ANN query sample is a prefix of the brute sample
    assert(ann.keySet.subsetOf(brute.keySet))
    assert(ann.nonEmpty)
    ann.foreach { case (_, ns) => assert(ns.size == 5) }
    ann.keys.toSeq.map(q => ann(q).count(brute(q).contains) / 5.0)
      .sum / ann.size
  }

  test("q114 PQ shortlist+re-rank recall@5 vs q50 brute >= 0.8") {
    val recall = recallAt5("q114_ann_pq")
    info(f"q114 recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"PQ recall@5 = $recall%.3f fell below 0.8")
  }

  test("q118 IVFADC (cells × codes) recall@5 vs q50 brute >= 0.8") {
    // two stacked approximations (cell routing at nprobe=6, ADC
    // shortlist at R=100) — measured 0.86; nprobe=4/R=50 was 0.66
    val recall = recallAt5("q118_ann_ivfpq")
    info(f"q118 recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"IVFADC recall@5 = $recall%.3f fell below 0.8")
  }
}
