package graft

import graft.queries.Registry

/** ANN quality contracts: the bucketed methods (q51 sign-LSH, q54 IVF
  * cells) against the exact brute-force top-k (q50) for the shared
  * query set (vec_id % 125 == 0 is a subset of q50's % 25 == 0). All
  * three are deterministic, so recall@3 is an exact regression value —
  * the measured cost of trading the all-pairs scan for bucketing,
  * documented here the way PERF.md documents the plan trade. */
class AnnRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private lazy val brute: Map[Long, Set[Long]] =
    Registry.byName("q50_knn_brute").run(spark, sf01).collect()
      .filter(_.getInt(1) <= 3) // brute top-3 per query
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }

  private def recallOf(name: String): Double = {
    val ann = Registry.byName(name).run(spark, sf01).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(4)).toSet }
    val shared = ann.keySet.intersect(brute.keySet)
    assert(shared.nonEmpty)
    shared.toSeq.map(q => ann(q).count(brute(q).contains) / 3.0)
      .sum / shared.size
  }

  // Measured on the sf0.01 corpus (near-orthogonal embeddings, top-3
  // at cosine ~0.37 — the hard case for bucketed ANN): multi-probe
  // LSH 0.5, IVF nprobe=2 0.583. The floor leaves margin only for a
  // testdata refresh.
  test("q51 multi-probe sign-LSH recall@3 vs brute force >= 0.4") {
    val r = recallOf("q51_ann_lsh")
    assert(r >= 0.4, s"LSH ANN recall collapsed: $r")
  }

  test("q54 IVF recall@3 vs brute force >= 0.4") {
    val r = recallOf("q54_ann_ivf")
    assert(r >= 0.4, s"IVF ANN recall collapsed: $r")
  }
}
