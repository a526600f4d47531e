package graft

import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY §7 "salting for skew", builder
  * brief): salted two-phase aggregation and salted replicated join must
  * produce exactly the plain results — the rewrite only changes the
  * shuffle key distribution. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val SALTS = 8

  // heavily skewed: 90% of rows share key "hot"
  private lazy val fact = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"cold${i % 37}" else "hot", i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = fact.groupBy($"k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    // phase 1: aggregate on (k, salt) — spreads the hot key over SALTS
    // reducers; phase 2: merge partials per k
    val salted = fact
      .withColumn("salt", pmod($"id", lit(SALTS)))
      .groupBy($"k", $"salt")
      .agg(sum($"v").as("ps"), count(lit(1)).as("pn"))
      .groupBy($"k")
      .agg(sum($"ps").as("s"), sum($"pn").as("n"))
    val d = direct.orderBy($"k").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    val sl = salted.orderBy($"k").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(d.map(_._1).toSeq == sl.map(_._1).toSeq)
    d.zip(sl).foreach { case ((_, ds, dn), (_, ss, sn)) =>
      assert(dn == sn); assert(approxEqual(ds, ss, 1e-9))
    }
  }

  test("q53 bucket-blocking bounds pair count under a fully skewed label") {
    // worst case for label-only blocking: EVERY row shares one label, so
    // the old all-pairs-within-label plan generates C(n,2) pairs. The
    // bucket-keyed plan must stay near C(n,2)/2^P (16 buckets, random
    // directions) — the bound that keeps a skewed label from going
    // quadratic at 100 TB.
    val n = 400
    val rnd = new scala.util.Random(7)
    val emb = (0 until n).map { i =>
      (0L, i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("label", "vec_id", "embedding")
    val pairs = graft.queries.SimilarityQueries
      .q53Pairs(spark, emb).count()
    val allPairs = n.toLong * (n - 1) / 2
    // expected ≈ allPairs/16; assert a 4× slack bound (≪ all-pairs)
    assert(pairs > 0, "bucket blocking produced no candidates")
    assert(pairs < allPairs / 4,
      s"bucket blocking degenerated toward all-pairs: $pairs of $allPairs")
  }

  test("q53 bucket-blocking retains true near-duplicate pairs") {
    // a near-dup (cosine → 1, angle θ → 0) crosses a random hyperplane
    // with probability θ/π → 0 — planted perturbed copies must stay
    // co-bucketed and rank at the top, with the exact label-block
    // baseline agreeing on those pairs.
    val rnd = new scala.util.Random(11)
    val bases = (0 until 30).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      val dup = v.map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      Seq((i.toLong % 3, i.toLong, v.map(_.toFloat)),
        (i.toLong % 3, 1000L + i, dup))
    }.toDF("label", "vec_id", "embedding")
    val top = graft.queries.SimilarityQueries
      .q53Blocked(spark, rows).collect()
    val planted = top.count(r => r.getLong(2) == r.getLong(1) + 1000L)
    assert(planted >= 18, s"only $planted of top-20 are planted near-dups")
    val exact = graft.queries.SimilarityQueries
      .q53ExactBaseline(spark, rows)
      .orderBy($"cos".desc, $"id_a", $"id_b").limit(20).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val blocked = top.map(r => (r.getLong(1), r.getLong(2))).toSet
    val recall = blocked.count(exact.contains) / 20.0
    assert(recall >= 0.9,
      s"bucket-blocked top-20 recall vs exact baseline: $recall")
  }

  test("salted replicated join equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold11", "C11"))
      .toDF("k", "attr")
    val plain = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")).collect()(0)
    // fact side: deterministic salt; dim side: replicate × SALTS
    val factS = fact.withColumn("salt", pmod($"id", lit(SALTS)))
    val dimS = dim.withColumn("salt",
      explode(sequence(lit(0), lit(SALTS - 1)).cast("array<long>")))
    val salted = factS.join(dimS, Seq("k", "salt"))
      .agg(count(lit(1)).as("n"), sum($"v").as("s")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0))
    assert(approxEqual(plain.getDouble(1), salted.getDouble(1), 1e-9))
  }
}
