package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join via bucketing — count right-side events whose ts
  * falls in [left.ts − window, left.ts] per left row.
  *
  * A naive theta-join on the time predicate compiles to a
  * BroadcastNestedLoopJoin (O(n·m), full-side broadcast — the same
  * trap the cosine pair join had). Bucketing the time axis at window
  * granularity turns it into an EQUI-join: a right row at t_r can
  * only serve left rows in buckets {⌊t_r/w⌋, ⌊t_r/w⌋+1}, so the
  * right side explodes to those two buckets and joins on bucket id,
  * with the exact range re-checked on the (bounded) matches. This is
  * the standard interval-join rendering (Flink interval join / the
  * shape Spark's range-join hints produce): join fan-out per row is
  * bounded by rows-per-window, never all-pairs, and the shuffle key
  * (bucket) is dense and skew-resistant for event-time data.
  */
object RangeJoin {

  /** @param left     rows to enrich; must have `ts` and the id column
    * @param right    rows to count; must have `ts`
    * @param leftId   unique left id column name
    * @param windowMs lookback window in milliseconds (inclusive both
    *                 ends: [t − w, t])
    * @return (leftId, n_in_window) — 0 for lefts with no matches
    */
  def countInWindow(left: DataFrame, right: DataFrame,
                    leftId: String, windowMs: Long): DataFrame = {
    val lb = left.select(col(leftId), unix_millis(col("ts")).as("_lts"))
      .withColumn("_b", floor(col("_lts") / windowMs))
    val rts = right.select(unix_millis(col("ts")).as("_rts"))
      .withColumn("_rb", floor(col("_rts") / windowMs))
    val rb = rts.select(col("_rts"),
      explode(array(col("_rb"), col("_rb") + 1)).as("_b"))
    val counted = lb.join(rb, "_b")
      .filter(col("_rts") >= col("_lts") - windowMs && col("_rts") <= col("_lts"))
      .groupBy(col(leftId))
      .agg(count(lit(1)).as("n_in_window"))
    left.select(col(leftId))
      .join(counted, Seq(leftId), "left")
      .select(col(leftId), coalesce(col("n_in_window"), lit(0L)).as("n_in_window"))
  }
}
