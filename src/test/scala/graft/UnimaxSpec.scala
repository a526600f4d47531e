package graft

import graft.queries.{Registry, TextQueries}

/** q194's UNIMAX waterfall on corpora where the allocation is
  * computable by hand (Chung et al. 2023 semantics: uniform-first,
  * per-language epoch cap, exact integer budget conservation). The
  * registry gate pins cross-engine equality; this pins the waterfall
  * itself — prefix binding, remainder distribution, greedy selection. */
class UnimaxSpec extends SparkSpec {

  private def sheet(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    TextQueries.unimaxAlloc(rows.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
  }

  test("waterfall: capped prefix binds, the big language takes the leftover") {
    // A: 6 tokens, B: 10, C: 30 ⇒ capacities (cap=2) 12/20/60,
    // budget = 46·3 div 2 = 69. Ascending: A binds (12·3 ≤ 69),
    // B binds (20·2 ≤ 57), C fails (60 > 37) ⇒ alloc = 12/20/37,
    // sum = budget exactly. Greedy keeps every doc (all cums fit).
    val rows = sheet(Seq(
      (1L, "x y z", "A"), (2L, "x y z", "A"),
      (3L, "a b c d e f g h i j", "B"),
      (4L, ("t " * 29).trim + " u", "C")))
    assert(rows("A") == ((2L, 6L, 12L, 12L, true, 2000000L, 2L, 6L)),
      rows("A"))
    assert(rows("B") == ((1L, 10L, 20L, 20L, true, 2000000L, 1L, 10L)),
      rows("B"))
    assert(rows("C") == ((1L, 30L, 60L, 37L, false, 1233333L, 1L, 30L)),
      rows("C"))
    assert(rows.values.map(_._4).sum == 69L)
  }

  test("remainder tokens go +1 to the first unbound languages") {
    // A: 1 token, B: 50, C: 51 ⇒ capacities 2/100/102, budget =
    // 102·3 div 2 = 153. A binds (2·3 ≤ 153); B fails (100·2 > 151)
    // ⇒ pool 151 over 2 langs: share 75, remainder 1 → B (first
    // unbound) gets 76, C gets 75. Conservation: 2+76+75 = 153.
    val rows = sheet(Seq(
      (1L, "x", "A"),
      (2L, ("b " * 49).trim + " c", "B"),
      (3L, ("d " * 50).trim + " e", "C")))
    assert(rows("A")._4 == 2L && rows("A")._5, rows("A"))
    assert(rows("B")._4 == 76L && !rows("B")._5, rows("B"))
    assert(rows("C")._4 == 75L && !rows("C")._5, rows("C"))
    assert(rows.values.map(_._4).sum == 153L)
  }

  test("hierarchical selection cumsum ≡ flat window per doc (real corpus)") {
    import spark.implicits._
    // the greedy selection's two spellings — the shipped bucketed
    // two-level prefix sum and the reference per-language flat window
    // — must keep the IDENTICAL doc set (the offset decomposition is
    // exact integer arithmetic), the ShardPackSpec discipline applied
    // to the UNIMAX/release selection.
    val dt = graft.Tables.documents(spark, sf)
      .selectExpr("lang", "doc_id",
        "CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS LONG) AS n_tok")
    val (_, hier) = TextQueries.unimaxPartsCounts(dt)
    val (_, flat) = TextQueries.unimaxPartsCounts(dt, hierarchical = false)
    val h = hier.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val f = flat.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(h.nonEmpty && h == f,
      s"hier-only: ${(h -- f).take(3)}; flat-only: ${(f -- h).take(3)}")
  }

  test("real corpus: budget conserved exactly, selection never exceeds the allocation") {
    val rows = Registry.byName("q194_unimax_alloc").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getLong(2)).sum
    val totCap = rows.map(_.getLong(3)).sum
    val budget = totTokens * 3 / 2
    assert(rows.map(_.getLong(4)).sum == math.min(budget, totCap))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), r)            // alloc ≤ cap
      assert(r.getLong(8) <= r.getLong(4), r)            // kept ≤ alloc
      assert(r.getBoolean(5) == (r.getLong(4) == r.getLong(3)), r)
    }
  }
}
