package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Contract of the native Space-Saving aggregate (graft_topk_freq) in
  * BOTH regimes: exact while distinct ≤ k (what the q125 oracle
  * hashes) and the guaranteed-approximation regime k ≪ distinct the
  * oracle can't reach — heavy hitters must survive eviction pressure
  * with true ≤ cnt ≤ true + err, in any partition layout. */
class TopKFreqSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(rows: Seq[String], k: Int, parts: Int) =
    rows.toDF("key").repartition(parts)
      .agg(GraftFunctions.topKFreq(spark, $"key", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.key", $"e.cnt", $"e.err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: distinct <= k reproduces exact counts, err 0") {
    val rows = Seq.tabulate(3000)(i => s"w${i % 40}")
    for (parts <- Seq(1, 7)) {
      val got = summarize(rows, k = 64, parts)
      assert(got.length == 40)
      assert(got.forall(_._3 == 0L), "exact regime produced nonzero err")
      val true_ = rows.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      got.foreach { case (w, c, _) => assert(c == true_(w), s"$w: $c != ${true_(w)}") }
    }
  }

  test("approximate regime: Zipf heavy hitters survive, bounds hold") {
    // planted Zipf-ish stream: key z<j> appears 2000/(j+1) times over
    // 200 distinct keys; summarize with k = 16 (heavy eviction).
    // Deterministic interleave (round-robin by index) so the stream
    // isn't adversarially sorted.
    val raw = (0 until 200).flatMap(j => Seq.fill(2000 / (j + 1))(s"z$j"))
    val rows = raw.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % raw.size }
      .map(_._1)
    val true_ = raw.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = raw.size.toLong
    val k = 16
    for (parts <- Seq(1, 5)) {
      val got = summarize(rows, k, parts)
      assert(got.length == k)
      // Space-Saving invariant: cnt is an over-estimate within err
      got.foreach { case (w, c, e) =>
        val t = true_(w)
        assert(c >= t, s"$w undercounted: $c < $t")
        assert(c - e <= t, s"$w error bound violated: $c - $e > $t")
      }
      // every key with true frequency > N/k must be present (the
      // classical guarantee; merge preserves it via the floor rule)
      val mustHave = true_.filter(_._2 > n / k).keySet
      val present = got.map(_._1).toSet
      assert(mustHave.subsetOf(present),
        s"missing guaranteed heavy hitters: ${mustHave -- present}")
    }
  }

  test("summary is O(k): buffer never exceeds k entries") {
    val rows = (0 until 5000).map(i => s"u$i") // all distinct
    val got = summarize(rows, k = 32, parts = 4)
    assert(got.length == 32)
  }
}
