package graft.streaming

import graft.streaming.DedupStream.Ev
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** On-arrival anomaly monitor — the streaming twin of
  * `Relational.qAnomaly`, in the reference's Analytics alerting
  * family (Analytics.java:50-61 alerts on windowed ratios; this
  * alerts on per-event deviation). Each event is flagged against the
  * RUNNING per-type statistics (prefix semantics: a stream can't see
  * the future, so the monitor uses everything seen so far including
  * the current event — the batch operator is the end-of-day replay
  * with global stats).
  *
  * The outlier test is the same cross-multiplied exact-integer form
  * as the batch side, |x − μ| > 2σ as (n·x − Σ)² > 4·(n·Σx² − Σ²),
  * evaluated in BigInt on the driver-free executor path — no float
  * mean, no sqrt. State per event_type is three longs; Σx² in cents²
  * stays under 2⁶³ to ~10⁹ events/type (past that, widen the state
  * field to BigDecimal — the encoder supports it).
  *
  * State is keyed by event_type (bounded by type cardinality, so no
  * timeout is needed); within a micro-batch slice events are
  * processed in (ts ms, event_id) order, making output deterministic
  * for any batch split that respects event-time order.
  */
object AnomalyStream {

  /** Running per-type moment state: count, Σcents, Σcents². */
  case class TypeStats(n: Long, sum: Long, sumsq: Long)

  case class AnomalyFlag(event_id: Long, event_type: String, cents: Long,
                         n_so_far: Long, is_outlier: Boolean)

  def centsOf(e: Ev): Long = math.round(e.value * 100)

  /** One key's slice of one micro-batch folded into the running
    * stats; returns the flags in processing order plus the new state.
    * Exposed so tests (and the batch replay) share the exact kernel.
    */
  def foldSlice(events: Seq[Ev], st0: TypeStats): (Seq[AnomalyFlag], TypeStats) = {
    var st = st0
    val out = Seq.newBuilder[AnomalyFlag]
    events.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val cents = centsOf(e)
      st = TypeStats(st.n + 1, st.sum + cents, st.sumsq + cents * cents)
      val d = BigInt(st.n) * cents - st.sum
      val varN2 = BigInt(st.n) * st.sumsq - BigInt(st.sum) * st.sum
      out += AnomalyFlag(e.event_id, e.event_type, cents, st.n, d * d > varN2 * 4)
    }
    (out.result(), st)
  }

  def anomalyStream(events: Dataset[Ev],
                    watermark: String = "10 minutes"): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeStats, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[Ev], state: org.apache.spark.sql.streaming.GroupState[TypeStats]) =>
          val (out, st) = foldSlice(batch.toSeq, state.getOption.getOrElse(TypeStats(0L, 0L, 0L)))
          state.update(st)
          out.iterator
      }
  }
}
