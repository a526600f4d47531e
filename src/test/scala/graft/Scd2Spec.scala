package graft

import graft.queries.Registry

/** q175 SCD2 invariants: every doc's version rows must form one of
  * the four legal type-2 patterns, and the pattern census must equal
  * q147's read-side diff rollup exactly — the write-side merge and
  * the read-side audit are two views of the same snapshot delta. */
class Scd2Spec extends SparkSpec {

  test("q175 rows form legal SCD2 patterns matching the q147 census") {
    val dir = "/root/testdata/sf0.01"
    val rows = Registry.byName("q175_scd2_merge").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // is_current must be exactly valid_to IS NULL
    assert(rows.forall { case (_, _, vt, cur) => cur == vt.isEmpty })
    val byDoc = rows.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq).toMap
    def classify(p: Seq[(Long, Option[Long])]): String = p match {
      case Seq((1L, None))                   => "unchanged"
      case Seq((1L, Some(2L)), (2L, None))   => "changed"
      case Seq((1L, Some(2L)))               => "removed"
      case Seq((2L, None))                   => "added"
      case other => fail(s"illegal SCD2 pattern: $other")
    }
    val census = byDoc.values.toSeq.map(classify)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = Registry.byName("q147_snapshot_diff").run(spark, dir)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(census == want, s"$census vs $want")
    // non-vacuous: all four statuses must occur in the testdata
    assert(census.keySet ==
      Set("unchanged", "changed", "removed", "added"), census.toString)
  }
}
