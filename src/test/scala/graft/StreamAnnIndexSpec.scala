package graft

import graft.queries.{Registry, SimilarityQueries, StreamingQueries}

/** q183 stream ≡ batch, inside Spark: the per-cell rollup the gate
  * hashes is an aggregate — this pins the underlying claim directly,
  * comparing the streamed-and-compacted index rows against the batch
  * ivfadcIndex artifact row for row (same vec_id → same cell, same
  * codes), so a compensating-error rollup collision can't hide an
  * encode divergence. */
class StreamAnnIndexSpec extends SparkSpec {

  test("streamed PQ-encode deltas compact to the batch IVFADC index, row for row") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = sf
    val scratch = tmpDir("graft_q183spec")
    val q = StreamingQueries.annIndexDeltas(spark, dir)
      .writeStream.format("parquet")
      .option("path", s"$scratch/sink")
      .option("checkpointLocation", s"$scratch/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val streamed = rows(spark.read.parquet(s"$scratch/sink")
      .select($"vec_id", $"cell", $"codes"))
    val batch = rows(SimilarityQueries.ivfadcIndex(spark, dir))
    assert(streamed == batch,
      s"stream/batch index diverged: ${streamed.diff(batch).take(3)} vs " +
        s"${batch.diff(streamed).take(3)}")
    // and the registry gate itself accounts every indexed vector
    val gate = Registry.byName("q183_stream_ann_index").run(spark, dir)
      .collect()
    assert(gate.map(_.getLong(1)).sum == batch.size, gate.mkString("\n"))
  }
}
