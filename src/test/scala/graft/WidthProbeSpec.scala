package graft

import graft.queries.TrajectoryQueries

/** q160 width-64 fidelity probe: the one-aggregation GD epoch at the
  * reference's true 64×64 hidden body, with the ~4.7k-double
  * gradient reduced in four sharded graft_vec_sum buffers. The
  * sharded reduce must be BIT-identical to the single-buffer one
  * (slicing an elementwise sum is exact), and the loop must actually
  * run and move the weights at h=64 — the width q160's gate note
  * documents as config, not architecture. */
class WidthProbeSpec extends SparkSpec {

  test("h=64 GD epoch: 4-sharded vec_sum == single buffer, bit-exact") {
    val dir = "/root/testdata/sf0.001"
    val one = TrajectoryQueries.mlpGdWidthProbe(spark, dir,
      h = 64, iters = 3, shards = 1)
    val four = TrajectoryQueries.mlpGdWidthProbe(spark, dir,
      h = 64, iters = 3, shards = 4)
    val p = 7 * 64 + 64 + 64 * 64 + 64 + 64 + 1
    assert(one.length == p && four.length == p,
      s"${one.length}/${four.length} vs $p")
    assert(one.forall(x => !x.isNaN && !x.isInfinite))
    val diff = one.zip(four).zipWithIndex.filter { case ((a, b), _) =>
      java.lang.Double.doubleToLongBits(a) !=
        java.lang.Double.doubleToLongBits(b)
    }
    assert(diff.isEmpty,
      s"${diff.size} weights diverge, first: ${diff.take(3).toSeq}")
    // the loop must have trained, not echoed the init (some weight
    // moved from its md5 init value)
    val h = 64
    val init0 = TrajectoryQueries.mlpGdWidthProbe(spark, dir,
      h = h, iters = 0, shards = 1)
    assert(!one.sameElements(init0), "weights did not move")
  }

  test("width-16 sharded reduce also matches (the gate width)") {
    val dir = "/root/testdata/sf0.001"
    val one = TrajectoryQueries.mlpGdWidthProbe(spark, dir,
      h = 16, iters = 2, shards = 1)
    val four = TrajectoryQueries.mlpGdWidthProbe(spark, dir,
      h = 16, iters = 2, shards = 4)
    assert(one.map(java.lang.Double.doubleToLongBits).toSeq ==
      four.map(java.lang.Double.doubleToLongBits).toSeq)
  }
}
