package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Contract of the native bloom pair (graft_bloom_agg /
  * graft_bloom_contains): NO false negatives ever (the safe direction
  * of the decontamination screen), blob identity under any partition
  * layout (merge is a bitwise OR), a measurable-but-bounded FP rate
  * on a deliberately undersized filter (what the q128 oracle can't
  * exercise — its sizing makes FPs ~impossible), and loud failure on
  * malformed input instead of wrong answers. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq.tabulate(2000)(i => s"key-$i-${i * 31}")

  private def buildBlob(ks: Seq[String], nbits: Long, k: Int,
      parts: Int): Array[Byte] =
    ks.toDF("s").repartition(parts)
      .agg(GraftFunctions.bloomAgg(spark, $"s", nbits, k).as("b"))
      .collect()(0).getAs[Array[Byte]](0)

  test("no false negatives: every inserted key probes true") {
    val blob = buildBlob(keys, 1L << 16, 5, 3)
    val misses = keys.toDF("s")
      .withColumn("hit",
        GraftFunctions.bloomContains(spark, lit(blob), $"s"))
      .filter(!$"hit").count()
    assert(misses == 0L, s"$misses inserted keys probed false")
  }

  test("blob is partition-layout independent (OR-merge commutes)") {
    val a = buildBlob(keys, 1L << 16, 5, 1)
    val b = buildBlob(keys, 1L << 16, 5, 13)
    assert(java.util.Arrays.equals(a, b),
      "same key set, different partitioning -> different blob")
  }

  test("inserts are idempotent: duplicates don't change the blob") {
    val a = buildBlob(keys, 1L << 16, 5, 4)
    val b = buildBlob(keys ++ keys ++ keys.take(500), 1L << 16, 5, 4)
    assert(java.util.Arrays.equals(a, b))
  }

  test("undersized filter: FP rate present but bounded; sized filter: ~zero") {
    val absent = Seq.tabulate(10000)(i => s"absent-$i-${i * 17}")
    def fpCount(nbits: Long): Long = {
      val blob = buildBlob(keys, nbits, 5, 4)
      absent.toDF("s")
        .withColumn("hit",
          GraftFunctions.bloomContains(spark, lit(blob), $"s"))
        .filter($"hit").count()
    }
    // 2^14 bits for 2000 keys ≈ 8 bits/key → theory ~2% FP; allow 5%
    val tight = fpCount(1L << 14)
    assert(tight <= 500, s"undersized filter FP rate too high: $tight/10000")
    // 2^20 bits for 2000 keys → FP odds ~1e-12 per probe
    assert(fpCount(1L << 20) == 0L, "well-sized filter produced FPs")
  }

  test("geometry travels in the blob: probe needs no (nbits, k) args") {
    val blob = buildBlob(keys, 1L << 12, 3, 2)
    assert(blob.length == 4 + (1 << 12) / 8)
    // header k = 3 big-endian
    assert(blob(3) == 3.toByte && blob(0) == 0.toByte)
  }

  test("malformed blob and bad literals fail loudly") {
    intercept[Exception] {
      Seq("x").toDF("s")
        .withColumn("hit", GraftFunctions.bloomContains(
          spark, lit(Array[Byte](1, 2, 3)), $"s"))
        .collect()
    }
    intercept[Exception] { // nbits not a power of two
      Seq("x").toDF("s")
        .agg(GraftFunctions.bloomAgg(spark, $"s", 100L, 5)).collect()
    }
    intercept[Exception] { // k out of range
      Seq("x").toDF("s")
        .agg(GraftFunctions.bloomAgg(spark, $"s", 1L << 10, 0)).collect()
    }
  }
}
