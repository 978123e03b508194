package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregation — materialized-view maintenance on the
  * partial-aggregate algebra. A nightly 100 TB pipeline does NOT
  * re-aggregate history when a day of data lands; it keeps mergeable
  * STATE per group (count / sum / min / max — each a commutative
  * monoid) and folds the delta in. `merge(state(old), state(delta))
  * === state(old ∪ delta)` is exactly Spark's own partial-aggregation
  * invariant, promoted to a storage-level contract.
  *
  * The driver query splits events at the median day, merges the two
  * states, and the DuckDB oracle aggregates the WHOLE table flat —
  * the gate literally checks incremental == full recompute.
  */
object IncrementalAgg {

  /** Mergeable per-type state over the cents measure: one
    * map-combinable pass, 5 output rows.
    */
  def aggState(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))

  /** Fold any number of states into one: the same monoid per
    * measure (n/sum add, min/max lattice). Union of state tables →
    * one tiny groupBy.
    */
  def mergeStates(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
        min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))

  /** Derived display measures belong AFTER the merge (avg is not a
    * monoid; it divides merged sums — the classic incremental-view
    * mistake is storing it).
    */
  private def withDerived(state: DataFrame): DataFrame =
    state.select(col("event_type"), col("n"), col("sum_cents"),
      col("min_cents"), col("max_cents"),
      expr("(sum_cents * 100) div n").as("avg_cents_x100"))

  /** The driver contract query: split events on day parity (a
    * deterministic stand-in for "history vs today's delta"),
    * aggregate each side independently, merge — checked against a
    * flat full-table aggregate by the oracle.
    */
  def qIncrAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
    val old = ev.filter(expr("day % 2 = 0"))
    val delta = ev.filter(expr("day % 2 = 1"))
    withDerived(mergeStates(Seq(aggState(old), aggState(delta))))
  }
}
