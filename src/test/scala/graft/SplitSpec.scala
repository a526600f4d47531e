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
}
