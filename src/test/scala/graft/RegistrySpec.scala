package graft

import graft.queries.Registry

/** Smoke: every registered query runs on sf0.001 and returns rows;
  * flagship entry returns rows (driver's t1 contract). */
class RegistrySpec extends SparkSpec {

  test("flagship entry returns rows with a valid AUC") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val auc = rows(0).getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("every query name has well-formed metadata") {
    assert(Registry.all.nonEmpty)
    assert(Registry.byName.size == Registry.all.size)
    Registry.all.foreach { q =>
      assert(q.name.matches("q[0-9]+_[a-z0-9_]+"), s"bad name ${q.name}")
    }
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001 and returns rows") {
      assert(q.run(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
