package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming dedup — the direct analog of the reference
  * service (Deduplicator.java): a Pulsar consumer/producer pair with
  * an in-memory hash→first-seen-ts cache becomes readStream →
  * stateful dedup → writeStream with per-key state and watermark-
  * bounded cleanup (the cacheTTL, environment.conf).
  *
  * Two renderings:
  *  - [[dedupWithinWatermark]]: built-in `dropDuplicatesWithinWatermark`
  *    — Spark manages state + eviction; first-seen-wins within the
  *    watermark horizon. The production default.
  *  - [[dedupTtlChain]]: exact reference chain semantics via
  *    flatMapGroupsWithState — a duplicate is an event whose content
  *    key saw a PRIME within ttl; duplicates do NOT refresh the
  *    anchor (cache.put only happens on miss, Deduplicator.java:51);
  *    a prime older than ttl readmits. Event-time timeout evicts
  *    state, so state size is bounded by keys-per-ttl-window, not
  *    total keys.
  */
object DedupStream {

  /** One event message (events-table schema; `events.ts` must already
    * be a µs timestamp — Tables.events handles the nanos parquet).
    */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)

  /** Dedup state: the anchor prime's event-time millis. */
  case class PrimeAnchor(primeTsMs: Long)

  def contentKeyOf(e: Ev): String = s"${e.user_id}|${e.event_type}|${e.value}|${e.props}"

  /** Walk a content-key group in (ts, event_id) order, continuing from
    * an optional anchor: emit primes, drop duplicates (prime within
    * ttl). Returns (emitted primes, final anchor). Shared by the
    * batch operator, the streaming operator, and the test oracle —
    * one definition of the reference semantics.
    */
  def chainPrimes(events: Seq[Ev], ttlMs: Long,
                  anchor: Option[Long]): (Seq[Ev], Option[Long]) = {
    var a = anchor
    val out = Seq.newBuilder[Ev]
    events.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      a match {
        case Some(p) if t - p <= ttlMs => // duplicate: dropped, anchor NOT refreshed
        case _ => a = Some(t); out += e
      }
    }
    (out.result(), a)
  }

  /** Streaming first-seen-wins dedup on the content key with
    * watermark-bounded state (built-in operator).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(graft.operators.Dedup.contentCols)

  /** Streaming exact-chain TTL dedup (reference cache semantics).
    * State per content key = the anchor prime's ts; event-time
    * timeout at anchor + ttl + watermark slack evicts it.
    */
  def dedupTtlChain(events: Dataset[Ev], ttlMs: Long,
                    watermark: String = "10 minutes"): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(contentKeyOf)
      .flatMapGroupsWithState[PrimeAnchor, Ev](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[Ev], state: GroupState[PrimeAnchor]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (emitted, anchor) =
              chainPrimes(batch.toSeq, ttlMs, state.getOption.map(_.primeTsMs))
            anchor.foreach { p =>
              state.update(PrimeAnchor(p))
              state.setTimeoutTimestamp(p + ttlMs)
            }
            emitted.iterator
          }
      }
  }

  /** Streaming dedup analytics (Analytics.java:47-79): per 1-minute
    * event-time window — primes, duplicates, ratio, mean dup delay.
    * The stateful pass annotates each event (is_dup, delay vs the
    * anchor prime) in one flatMapGroupsWithState; the windowed agg
    * downstream is a plain watermarked groupBy.
    */
  case class Annotated(event_id: Long, ts: java.sql.Timestamp,
                       is_dup: Boolean, delay_ms: Long)

  def annotate(events: Dataset[Ev], ttlMs: Long,
               watermark: String = "10 minutes"): Dataset[Annotated] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(contentKeyOf)
      .flatMapGroupsWithState[PrimeAnchor, Annotated](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[Ev], state: GroupState[PrimeAnchor]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var a = state.getOption.map(_.primeTsMs)
            val out = Seq.newBuilder[Annotated]
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              a match {
                case Some(p) if t - p <= ttlMs =>
                  out += Annotated(e.event_id, e.ts, is_dup = true, t - p)
                case _ =>
                  a = Some(t)
                  out += Annotated(e.event_id, e.ts, is_dup = false, 0L)
              }
            }
            a.foreach { p =>
              state.update(PrimeAnchor(p))
              state.setTimeoutTimestamp(p + ttlMs)
            }
            out.result().iterator
          }
      }
  }

  /** NOTE: chaining a flatMapGroupsWithState with a downstream
    * windowed aggregate is a multi-stateful-operator pipeline; Spark
    * blocks it by default (global-watermark late-row risk). Run with
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=
    * false` and keep the watermark ≥ the annotate ttl so annotated
    * rows can't be late for the window state.
    */
  def windowedStats(annotated: Dataset[Annotated]): DataFrame =
    annotated
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        sum(when(!col("is_dup"), 1).otherwise(0)).cast("long").as("primes"),
        sum(when(col("is_dup"), 1).otherwise(0)).cast("long").as("duplicates"),
        avg(when(col("is_dup"), col("delay_ms"))).as("avg_delay_ms"))
}
