package graft

import org.apache.spark.sql.functions._
import graft.queries.{Registry, SimilarityQueries, StreamingQueries}

/** q208's two halves pinned inside Spark: (1) the streamed frozen-
  * scale deltas compact with the base artifact to EXACTLY the batch
  * full-corpus encode at the frozen scale, row for row (stream ≡
  * batch for the SQ8 artifact — StreamAnnIndexSpec's discipline for
  * the scalar quantizer); (2) the re-scale audit's semantics: drift
  * is a ratio of true max-components, the decision bit follows the
  * threshold, and a no-drift corpus re-encodes to identical codes. */
class Sq8MaintainSpec extends SparkSpec {

  test("streamed SQ8 deltas + base artifact ≡ batch frozen-scale encode") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val scratch = tmpDir("graft_q208spec")
    val q = StreamingQueries.sq8Deltas(spark, sf)
      .writeStream.format("parquet")
      .option("path", s"$scratch/sink")
      .option("checkpointLocation", s"$scratch/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val mx = StreamingQueries.sq8FrozenScale(spark, sf)
    val u = SimilarityQueries.unitVecs(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
    val base = StreamingQueries.sq8CodesAt(
      u.filter(StreamingQueries.vecIxOf($"vec_id") >=
        graft.queries.DedupQueries.IngestSplit.NewMax), mx)
    val compacted = rows(base) ++
      rows(spark.read.parquet(s"$scratch/sink"))
    val batch = rows(StreamingQueries.sq8CodesAt(u, mx))
    assert(compacted == batch,
      s"stream/batch SQ8 diverged: ${compacted.diff(batch).take(3)} vs " +
        s"${batch.diff(compacted).take(3)}")
    assert(compacted.nonEmpty)
  }

  test("re-scale audit: drift ratio, decision bit, no-drift identity") {
    import spark.implicits._
    val sheet = Registry.byName("q208_sq8_maintain").run(spark, sf)
      .localCheckpoint(true)
    // drift6 is constant across cells and equals the true ratio
    val d6 = sheet.select($"drift6").distinct().collect()
    assert(d6.length == 1)
    val drift6 = d6(0).getLong(0)
    val u = SimilarityQueries.unitVecs(spark, sf)
    val mxBase = StreamingQueries.sq8FrozenScale(spark, sf)
      .collect()(0).getDouble(0)
    val mxFull = u
      .agg(max(expr("array_max(transform(v, x -> abs(x)))")))
      .collect()(0).getDouble(0)
    assert(drift6 == math.floor(mxFull / mxBase * 1e6 + 0.5).toLong)
    assert(mxFull >= mxBase) // full ⊇ base, so the scale only grows
    // decision bit tracks the threshold on every row
    val bad = sheet.filter($"would_rescale" =!= ($"drift6" > 1010000L))
      .count()
    assert(bad == 0)
    // no-drift ⇒ identical codes; drift ⇒ the changed count is real:
    // recompute n_changed independently from the two encodes
    val frozen = StreamingQueries.sq8CodesAt(u, StreamingQueries
      .sq8FrozenScale(spark, sf)).select($"vec_id", $"c")
    val full = StreamingQueries.sq8CodesAt(u,
        u.agg(max(expr("array_max(transform(v, x -> abs(x)))")).as("mx")))
      .select($"vec_id", $"c".as("cr"))
    val nChanged = frozen.join(full, "vec_id")
      .filter($"c" =!= $"cr").count()
    assert(sheet.agg(sum($"n_changed")).collect()(0).getLong(0) == nChanged)
    if (drift6 == 1000000L) assert(nChanged == 0)
  }
}
