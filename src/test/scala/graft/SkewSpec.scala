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
