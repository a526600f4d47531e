package graft

import graft.queries.Registry

/** q179 non-vacuity: the naive per-item split (q170's audit) must
  * actually LEAK on this corpus, and the group-aware split must
  * measure zero leaks while still using every item and all five
  * folds — i.e. the fix changes something real and costs nothing. */
class SplitSpec extends SparkSpec {

  test("group-aware split: zero leaks where the naive split leaks") {
    val dir = "/root/testdata/sf0.01"
    val naiveLeaks = Registry.byName("q170_split_leakage").run(spark, dir)
      .collect().map(_.getLong(3)).sum
    assert(naiveLeaks > 0L,
      "corpus has no naive-split leaks — q179's gate would be vacuous")
    val rows = Registry.byName("q179_leakage_safe_split").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(rows.map(_._4).sum == 0L, s"group-aware split leaked: $rows")
    assert(rows.map(_._2).sum == 500L, s"items lost: $rows")
    assert(rows.length == 5 && rows.forall(_._2 > 0L),
      s"degenerate fold layout: $rows")
    // components never exceed items, and at least one fold must hold
    // a multi-item component (n_components < n_vecs) — the case the
    // group assignment exists for
    assert(rows.forall(r => r._3 <= r._2), rows.toString)
    assert(rows.exists(r => r._3 < r._2), rows.toString)
  }

  test("min-label propagation converges identically at two partition counts") {
    import spark.implicits._
    import graft.queries.SimilarityQueries
    // planted graph: two components (a 6-node chain through 10..15 and
    // a triangle 20/21/22) plus a long path 30..39 that needs several
    // propagation rounds to collapse — the convergence loop, not just
    // the first sweep, is what the partition count must not change
    val pairs = (Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L), (20L, 21L), (21L, 22L), (20L, 22L)) ++
      (30L until 39L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val expect = ((10L to 15L).map(_ -> 10L) ++
      (20L to 22L).map(_ -> 20L) ++ (30L to 39L).map(_ -> 30L)).toSet
    for (parts <- Seq(1, 8)) {
      val got = SimilarityQueries.connectedComponents(spark, pairs, parts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got == expect, s"parts=$parts: $got")
    }
  }
}
