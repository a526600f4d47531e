package graft

import graft.queries.SimilarityQueries

/** q165's unroll-generalization pin: the MMR chain is GENERATED from
  * K (step 1 relevance argmax + a fold of penalized argmaxes), so a
  * K=8 run must match a driver-side reference greedy computed with
  * the engine's exact arithmetic (rounded-to-5 cosines via
  * dot/(sqrt(na)·sqrt(nb)) — the engine's association — and
  * (score desc, vec_id) tie-breaks). Pinning K=8 proves the unroll
  * is not specialized to the K=5 gate constant. */
class MmrKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = 8
  private val C = 20
  private val Lam = 0.7

  test("mmrDiversify K=8 matches the reference greedy selection") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qids = emb.keys.toSeq
      .map(id => (md5hex(s"q162:$id"), id)).sorted.take(8).map(_._2)
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the engine's exact spelling: sequential-fold dot, norms as
    // sqrt(dot(v,v)) multiplied (NOT sqrt of the product)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      d
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      r5(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val want = qids.flatMap { q =>
      val cand = emb.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(emb(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(C)
      val simq = cand.toMap
      val ids = cand.map(_._1)
      var sel = Vector.empty[Long]
      (1 to K).map { step =>
        val pick =
          if (step == 1) ids.minBy(id => (-simq(id), id))
          else ids.filterNot(sel.contains).minBy { id =>
            val pen = sel.map(s => cos(emb(id), emb(s))).max
            (-(Lam * simq(id) - (1 - Lam) * pen), id)
          }
        sel :+= pick
        (q, step, pick)
      }
    }.toSet
    val got = SimilarityQueries.mmrDiversify(spark, dir, K).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.size == 8 * K, s"${got.size} selections")
    assert(got == want,
      s"diverging picks: ${(got -- want).toSeq.sorted.take(5)} vs ${(want -- got).toSeq.sorted.take(5)}")
  }
}
