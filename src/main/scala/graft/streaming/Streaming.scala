package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10): the reference is
  * batch-only, but its per-series recurrences (W2/W7) are deliberately
  * shaped like GroupState updates — these operators are the streaming
  * twins of SeriesOps.resample / SeriesOps.sessionize / ArrayOps.emaLast,
  * sharing semantics with the batch queries (q26, q25, q22).
  *
  * Scale notes: state is bounded per key (EMA: one double + count;
  * windows: watermark-bounded), so executors hold O(active keys) state;
  * watermarks bound late data and let the state store evict. All
  * aggregations are partial-aggregate streaming aggs — the standard
  * 1000-executor shape.
  */
object Streaming {

  /** tumbling event-time window aggregation with watermark — streaming
    * twin of q26_resample_daily. */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 day",
                  watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(col("win.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"), col("avg_value"))

  /** SLIDING event-time window aggregation with watermark — each event
    * lands in windowLen/slide overlapping windows (the smoothing
    * companion to tumblingAgg; same watermark-emission contract). */
  def slidingAgg(events: DataFrame, windowLen: String = "2 days",
                 slide: String = "1 day", watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("w_start"), col("win.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** gap-based session window aggregation — streaming twin of
    * q25_sessionize (30-min gap). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("session_events"),
        sum(col("value")).as("session_value"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("session_events"),
        col("session_value"))

  /** streaming exact dedup — the streaming twin of q40: emit only the
    * first document per content fingerprint, with the watermark
    * bounding how long each seen-fingerprint state is retained (the
    * ingestion-time dedup a training-data pipeline runs in front of
    * the corpus store; state is O(distinct fingerprints inside the
    * watermark), evicted as event time advances). `docs` needs columns
    * (ts TIMESTAMP, fp STRING). */
  def dedupStream(docs: DataFrame, watermark: String = "1 day"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessState(start: Long, last: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start: Long,
                                 session_end: Long, n: Long, sum: Double)

  /** custom stateful sessionizer via flatMapGroupsWithState: carries an
    * open session per key across micro-batches, EMITS each session the
    * moment a gap closes it (unlike session_window, which waits for the
    * watermark) — the §2.10 GroupState shape with multi-row output.
    * Gap unit: milliseconds of event time. */
  def sessionizeStateful(events: Dataset[Event],
                         gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[SessState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case null =>
                st = SessState(t, t, 1L, e.value)
              case s if t - s.last > gapMs =>
                closed += ClosedSession(uid, s.start, s.last, s.n, s.sum)
                st = SessState(t, t, 1L, e.value)
              case s =>
                st = SessState(s.start, t, s.n + 1, s.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }
  final case class EmaState(ema: Double, n: Long)
  final case class EmaOut(user_id: Long, batch_events: Long,
                          total_events: Long, ema: Double)

  /** gap sessionizer with EVENT-TIME TIMEOUT: a session also closes
    * when the WATERMARK passes last_event + gap — no later event for
    * the key required (the piece `sessionizeStateful` leaves to the
    * next batch). State per key is one open session; the timeout
    * timestamp doubles as the eviction bound. */
  def sessionizeWithTimeout(events: Dataset[Event], gapMs: Long,
                            watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, batch, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null => st = SessState(t, t, 1L, e.value)
                case s if t - s.last > gapMs =>
                  closed += ClosedSession(uid, s.start, s.last, s.n, s.sum)
                  st = SessState(t, t, 1L, e.value)
                case s => st = SessState(s.start, t, s.n + 1, s.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** per-key EMA recurrence via mapGroupsWithState — the online form of
    * ArrayOps.emaLast (α-blend, order = event time within each batch;
    * same step function as the batch scan, W2/W7 family). Emits one
    * updated state row per key per micro-batch. */
  def emaPerKey(events: Dataset[Event], alpha: Double): Dataset[EmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EmaState, EmaOut](GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[EmaState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val st0 = state.getOption.getOrElse(EmaState(Double.NaN, 0L))
          val st = sorted.foldLeft(st0) { (s, e) =>
            if (s.n == 0L) EmaState(e.value, 1L)
            else EmaState(s.ema * (1 - alpha) + e.value * alpha, s.n + 1)
          }
          state.update(st)
          EmaOut(uid, sorted.size.toLong, st.n, st.ema)
      }
  }

  final case class DriftEvent(event_type: String, ts: java.sql.Timestamp,
                              value: Double, event_id: Long, mu6: Long)
  final case class DriftState(p6: Long, min6: Long, max6: Long,
                              alarmN: Long, n: Long,
                              lastMs: Long, lastV: Double, lastId: Long)
  final case class DriftOut(event_type: String, batch_events: Long,
                            n: Long, cusum_max6: Long, alarm_n: Long)

  /** half-away-from-zero micro-unit quantizer — the Scala twin of both
    * engines' `round(x · 10⁶, 0)` (math.round alone is floor(x+0.5),
    * which differs on negative halves). */
  def micro6(v: Double): Long =
    if (v >= 0) math.floor(v * 1e6 + 0.5).toLong
    else -math.floor(-v * 1e6 + 0.5).toLong

  /** One-sided CUSUM drift alarm (Page 1954) as online per-key state:
    * against a FROZEN baseline mean μ0 (the q157 discipline — the
    * reference distribution must not drift with the data it screens),
    * accumulate the prefix sum P_t of deviations d_t = x6 − μ0_6 and
    * track S_t = P_t − min(0, min_{j≤t} P_j) — the running-max
    * identity of the recurrence S_t = max(0, S_{t−1} + d_t), which is
    * what makes the operator BATCH-ORACLE-CHECKABLE: the oracle spells
    * the same statistic as a prefix sum minus a prefix min, two plain
    * windows. All arithmetic is exact int64 micro-units, so fold
    * (stream) ≡ window (batch) bit-for-bit. State per key is FIVE
    * longs regardless of volume; events fold in (ms, value, event_id)
    * order within each micro-batch (the q108 ordering contract).
    * alarm_n = the 1-based event index where S first exceeded h6
    * (0 = never). The baseline rides ON each event (`mu6` — attached
    * by the stream-static broadcast join upstream, the q112/q157
    * enrichment shape), so the operator holds no reference data.
    *
    * ORDERED-INGEST CONTRACT: the fold is exact only when micro-batch
    * boundaries respect the global (ts, value, event_id) order — the
    * operator sorts WITHIN a batch, but a cross-batch regression (an
    * event arriving after a later-ordered event was already folded:
    * multi-file sources racing, late data with no watermark) would
    * silently diverge from the batch prefix-sum oracle. The state
    * therefore carries the last-folded (ms, value, event_id) key and
    * the fold FAILS FAST on a regression instead of folding it —
    * loud beats silently-wrong for a statistic whose alarm index is
    * the product. Feed late-data sources through a watermark +
    * event-time sort upstream, or single-file AvailableNow reads
    * (q166's shape), which satisfy the contract by construction. */
  def cusumPerKey(events: Dataset[DriftEvent], h6: Long): Dataset[DriftOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState[DriftState, DriftOut](GroupStateTimeout.NoTimeout) {
        (k, batch, state: GroupState[DriftState]) =>
          val sorted = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.value, e.event_id))
          var st = state.getOption.getOrElse(
            DriftState(0L, 0L, 0L, 0L, 0L, Long.MinValue, 0.0, Long.MinValue))
          sorted.foreach { e =>
            val t = e.ts.getTime
            val regressed = st.n > 0L &&
              Ordering[(Long, Double, Long)].lt(
                (t, e.value, e.event_id), (st.lastMs, st.lastV, st.lastId))
            if (regressed)
              throw new IllegalStateException(
                s"cusumPerKey[$k]: out-of-order arrival across micro-batches — " +
                  s"event (ts=$t, value=${e.value}, id=${e.event_id}) precedes " +
                  s"last-folded (ts=${st.lastMs}, value=${st.lastV}, " +
                  s"id=${st.lastId}); the ordered-ingest contract is broken " +
                  "and the CUSUM fold would silently diverge from the batch " +
                  "prefix-sum oracle")
            val p = st.p6 + (micro6(e.value) - e.mu6)
            val mn = math.min(st.min6, p)
            val sv = p - mn
            val mx = math.max(st.max6, sv)
            val n = st.n + 1
            val al = if (st.alarmN == 0L && sv > h6) n else st.alarmN
            st = DriftState(p, mn, mx, al, n, t, e.value, e.event_id)
          }
          state.update(st)
          DriftOut(k, sorted.size.toLong, st.n, st.max6, st.alarmN)
      }
  }

  final case class CdcEvent(user_id: Long, ts: java.sql.Timestamp,
                            value: Double, event_id: Long, op: String)
  final case class CdcState(ms: Long, v: Double, v6: Long, id: Long,
                            del: Boolean, n: Long)
  final case class CdcOut(user_id: Long, n_ops: Long, last_ms: Long,
                          last_v6: Long, deleted: Boolean)

  /** Streaming CDC APPLY — materialize a keyed upsert/delete
    * changelog as last-writer-wins state (the Delta/Iceberg MERGE
    * workhorse run at ingest): per key keep the operation with the
    * greatest (ts, value, event_id) and whether it was a DELETE.
    * Unlike cusumPerKey's path-dependent fold, LWW is an ARGMAX —
    * commutative and associative — so micro-batch boundaries and
    * cross-batch disorder cannot change the final state and the
    * operator needs NO ordered-ingest guard (StreamingSkewSpec pins
    * boundary-invariance under an adversarial shuffle). State per
    * key: three longs + a flag + a count. Values ride as exact int64
    * micro-units so the downstream rollup is order-independent. */
  def lwwPerKey(events: Dataset[CdcEvent]): Dataset[CdcOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        (k, batch, state: GroupState[CdcState]) =>
          var st = state.getOption.getOrElse(
            CdcState(Long.MinValue, 0.0, 0L, Long.MinValue,
              del = false, 0L))
          batch.foreach { e =>
            val t = e.ts.getTime
            // the ordering key compares the ORIGINAL double (state
            // carries it alongside the micro-quantized output value —
            // comparing a de-quantized v6 would mis-order ties)
            val newer = st.n == 0L ||
              Ordering[(Long, Double, Long)].gt(
                (t, e.value, e.event_id), (st.ms, st.v, st.id))
            st =
              if (newer) CdcState(t, e.value, micro6(e.value),
                e.event_id, e.op == "D", st.n + 1)
              else st.copy(n = st.n + 1)
          }
          state.update(st)
          CdcOut(k, st.n, st.ms, st.v6, st.del)
      }
  }

  /** Idempotent foreachBatch file sink: each micro-batch lands in its
    * own `batch=<id>` subdirectory with mode OVERWRITE, so a RETRIED
    * micro-batch (task failure after a partial write, or a restart
    * replaying the last uncommitted batch — foreachBatch's documented
    * at-least-once delivery) rewrites its own directory instead of
    * appending a duplicate copy. Readers take the parent directory;
    * the `batch` key surfaces as a partition column they may drop.
    * This is the production-correct form of "append each update batch
    * to files" (SinkSpec replays a batch and pins the invariant). */
  def appendBatchIdempotent(out: String)(batch: DataFrame,
      batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
}
