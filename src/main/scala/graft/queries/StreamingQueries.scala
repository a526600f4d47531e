package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/** §2.10 under the DRIVER gate: each query here runs a real
  * `StreamingQuery` — file stream source over the events parquet →
  * the Streaming.* operator → `Trigger.AvailableNow` → parquet sink —
  * then re-reads the sink and hands the result to the DuckDB oracle.
  * Until round 6 the streaming operators were spec-only batch twins
  * (one engine checking itself); these entries make the streaming
  * engine's own output the thing the oracle hashes.
  *
  * Determinism under AvailableNow: the set of rows a watermarked
  * append-mode agg emits is independent of how the source splits
  * micro-batches — a finalized group is emitted exactly once, when the
  * watermark (monotone max event time − delay, ms floor) passes its
  * window end, and the run ends with a no-data batch that advances the
  * watermark to its final value. So the sink contents equal
  * "all windows with end ≤ max(ts) − delay", which is exactly what the
  * batch oracle computes.
  *
  * Scale: identical to the batch twins — watermark-bounded state per
  * key/window, partial aggregation before the shuffle, O(active
  * windows) in the state store; the file source at 100 TB becomes a
  * log/bucket listing, nothing in the query shape changes.
  */
object StreamingQueries {

  private val GapMs = 30L * 60 * 1000

  /** streaming read of the events parquet — same TIMESTAMP(NANOS)
    * handling as Tables.events, through the file STREAM source (schema
    * comes from one footer-only batch read; nanos surface as long and
    * become microsecond timestamps). */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    // the testdata table is a single FILE; FileStreamSource force-sets
    // basePath to the path unless it is a glob, and then rejects it for
    // not being a directory — so feed it a one-file GLOB plus an
    // explicit directory basePath
    s.readStream.schema(sch).option("basePath", dir)
      .parquet(s"$dir/{events}.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** run `agg` as an AvailableNow streaming job into a parquet sink
    * under `scratch`, wait for completion, re-read the sink. */
  private def runToSink(s: SparkSession, agg: DataFrame,
      scratch: String): DataFrame = {
    val out = scratch + "/sink"
    val q = agg.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", scratch + "/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(out)
  }

  /** q103: Streaming.tumblingAgg (1-day windows, 2-day watermark) under
    * the oracle — emitted rows are the daily windows finalized by the
    * final watermark; the oracle recomputes them in batch SQL with the
    * same `window end ≤ max(ts) − 2 days` cutoff. */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withScratchDir("graft_q103") { scratch =>
      runToSink(s, Streaming.tumblingAgg(eventsStream(s, dir)), scratch)
        .select($"bucket", $"event_type", $"n",
          round($"sum_value", 4).as("sum_value"),
          round($"avg_value", 6).as("avg_value"))
        .orderBy($"bucket", $"event_type")
    }
  }

  private val q103Sql =
    """WITH m AS (SELECT max(ts) AS mx FROM events),
      |w AS (
      | SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
      |  event_type, count(*) AS n,
      |  round(sum(value), 4) AS sum_value,
      |  round(avg(value), 6) AS avg_value
      | FROM events GROUP BY bucket, event_type)
      |SELECT bucket, event_type, n, sum_value, avg_value
      |FROM w, m
      |WHERE bucket + INTERVAL 1 DAY
      |      <= CAST(to_timestamp(epoch_ms(mx) / 1000.0) AS TIMESTAMP)
      |         - INTERVAL 2 DAY
      |ORDER BY bucket, event_type""".stripMargin

  /** q104: Streaming.sessionAgg (session_window, 30-min gap, 2-day
    * watermark) under the oracle. Spark merges an event into a session
    * while `ts < prev_end` (= prev ts + gap), so the oracle starts a
    * new session at `ts − prev ≥ gap`; `session_end = last ts + gap`;
    * the watermark cutoff drops sessions still open at end-of-stream. */
  private def q104(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withScratchDir("graft_q104") { scratch =>
      runToSink(s, Streaming.sessionAgg(eventsStream(s, dir)), scratch)
        .select($"user_id", $"session_start", $"session_end",
          $"session_events",
          round($"session_value", 4).as("session_value"))
        .orderBy($"user_id", $"session_start")
    }
  }

  private val q104Sql =
    """WITH o AS (
      | SELECT user_id, ts, value,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      | FROM events),
      |f AS (
      | SELECT user_id, ts, value,
      |  CASE WHEN prev IS NULL
      |        OR epoch_us(ts) - epoch_us(prev) >= 1800000000
      |       THEN 1 ELSE 0 END AS new_s
      | FROM o),
      |sess AS (
      | SELECT user_id, ts, value,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      | FROM f),
      |per AS (
      | SELECT user_id,
      |  CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS session_events,
      |  round(sum(value), 4) AS session_value
      | FROM sess GROUP BY user_id, sid),
      |m AS (SELECT max(ts) AS mx FROM events)
      |SELECT user_id, session_start, session_end, session_events,
      | session_value
      |FROM per, m
      |WHERE session_end
      |      <= CAST(to_timestamp(epoch_ms(mx) / 1000.0) AS TIMESTAMP)
      |         - INTERVAL 2 DAY
      |ORDER BY user_id, session_start""".stripMargin

  /** q105: Streaming.sessionizeStateful (flatMapGroupsWithState, the W2
    * GroupState scan shape) under the oracle. A session is EMITTED when
    * a later same-key event closes it (`t − last > gap`, ms precision —
    * the state step works on `Timestamp.getTime`), so the end-of-stream
    * sink holds every session except each key's open last one; the
    * oracle sessionizes in ms and drops each user's final session. */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withScratchDir("graft_q105") { scratch =>
      val ev = eventsStream(s, dir)
        .select($"user_id", $"ts", $"value").as[Streaming.Event]
      runToSink(s, Streaming.sessionizeStateful(ev, GapMs).toDF(), scratch)
        .select($"user_id", $"session_start", $"session_end", $"n",
          round($"sum", 4).as("session_value"))
        .orderBy($"user_id", $"session_start")
    }
  }

  private val q105Sql =
    """WITH e AS (
      | SELECT user_id, epoch_ms(ts) AS t, value FROM events),
      |o AS (
      | SELECT user_id, t, value,
      |  lag(t) OVER (PARTITION BY user_id ORDER BY t, value) AS prev
      | FROM e),
      |f AS (
      | SELECT user_id, t, value,
      |  CASE WHEN prev IS NULL OR t - prev > 1800000
      |       THEN 1 ELSE 0 END AS new_s
      | FROM o),
      |sess AS (
      | SELECT user_id, t, value,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY t, value
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      | FROM f),
      |per AS (
      | SELECT user_id, sid, min(t) AS session_start, max(t) AS session_end,
      |  count(*) AS n, round(sum(value), 4) AS session_value
      | FROM sess GROUP BY user_id, sid),
      |lasts AS (SELECT user_id, max(sid) AS last_sid FROM sess GROUP BY user_id)
      |SELECT p.user_id, session_start, session_end, n, session_value
      |FROM per p JOIN lasts l ON p.user_id = l.user_id
      |WHERE p.sid < l.last_sid
      |ORDER BY p.user_id, session_start""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q103_stream_tumbling", q103, Some(q103Sql),
      "§2.10 tumbling window agg through a real AvailableNow StreamingQuery"),
    Q("q104_stream_session", q104, Some(q104Sql),
      "§2.10 session_window agg through a real AvailableNow StreamingQuery"),
    Q("q105_stream_stateful", q105, Some(q105Sql),
      "§2.10 flatMapGroupsWithState sessionizer through a real AvailableNow StreamingQuery"))
}
