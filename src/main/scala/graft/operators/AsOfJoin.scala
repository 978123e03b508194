package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime, per key.
  *
  * Implemented with the union + last-carried-forward trick instead of
  * an O(n·m) range join: tag both sides, union, sort within each key
  * partition by (time, tag, tiebreak) and carry the last right-side id
  * forward. One shuffle on the key, no join blow-up — this is the
  * shape that survives 100 TB (a naive theta-join on key + time range
  * explodes; this is linear in rows after a single hash partition).
  *
  * Ties: a right row at exactly leftTime is visible (tag orders right
  * before left at equal times); among equal right times the largest
  * tiebreak wins, matching `ORDER BY ts DESC, id DESC LIMIT 1`.
  */
object AsOfJoin {

  /** @param left    rows to enrich
    * @param right   rows to look up as-of
    * @param key     equi-join key column name (same name both sides)
    * @param time    event-time column name (same name both sides)
    * @param leftId  unique left id column
    * @param rightId unique right id column (any orderable type — ids
    *                keep their original type; the equal-time tiebreak
    *                is that type's ordering, e.g. lexicographic for
    *                strings)
    * @return (leftId, key, time, rightId) — rightId null when no right
    *         row precedes the left row (left-outer as-of semantics)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           leftId: String, rightId: String): DataFrame = {
    // null slots are typed from each side's actual schema — no cast of
    // the caller's id columns (ANSI mode would throw on e.g. string
    // ids; the operator must not impose numeric ids)
    val lidType = left.schema(leftId).dataType
    val ridType = right.schema(rightId).dataType
    val l = left.select(col(key), col(time), col(leftId).as("_lid"))
      .withColumn("_rid", lit(null).cast(ridType)).withColumn("_tag", lit(1))
    val r = right.select(col(key), col(time), col(rightId).as("_rid"))
      .withColumn("_lid", lit(null).cast(lidType)).withColumn("_tag", lit(0))
      .select(col(key), col(time), col("_lid"), col("_rid"), col("_tag"))
    val unioned = l.select(col(key), col(time), col("_lid"), col("_rid"), col("_tag")).union(r)
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("_tag"), col("_rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last("_rid", ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_lid").as(leftId), col(key), col(time), col("_asof").as(rightId))
  }

  /** NEAREST join: for each left row, the right row minimizing
    * |rightTime − leftTime| per key, looking BOTH directions — the
    * sensor-alignment shape (as-of is "most recent ≤ t"; nearest is
    * "closest in either direction"). Same union + one-sort rendering,
    * with a last-carried-backward AND a first-carried-forward pass
    * over the one sorted partition — still one shuffle, no range
    * join. `time` must be numeric (pass unix_micros(ts) for
    * timestamps — interval arithmetic under ANSI is not worth the
    * genericity).
    *
    * Ties: a right row AT leftTime sorts before the left row, so it
    * is the backward candidate with gap 0 (never double-counted
    * forward); equal |gap| both sides resolves to the backward
    * (earlier) row; equal right times resolve to max id backward,
    * min id forward (each direction's carry order).
    *
    * @return (leftId, key, time, rightId, right_time, side) — side
    *         'before'/'after', all three null when the key has no
    *         right rows at all
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String, time: String,
                  leftId: String, rightId: String): DataFrame = {
    val lidType = left.schema(leftId).dataType
    val ridType = right.schema(rightId).dataType
    val l = left.select(col(key), col(time), col(leftId).as("_lid"))
      .withColumn("_rid", lit(null).cast(ridType)).withColumn("_tag", lit(1))
    val r = right.select(col(key), col(time), col(rightId).as("_rid"))
      .withColumn("_lid", lit(null).cast(lidType)).withColumn("_tag", lit(0))
      .select(col(key), col(time), col("_lid"), col("_rid"), col("_tag"))
    val unioned = l.select(col(key), col(time), col("_lid"), col("_rid"), col("_tag")).union(r)
    val ord = Window.partitionBy(key)
      .orderBy(col(time), col("_tag"), col("_rid").asc_nulls_first)
    val rightRow = when(col("_tag") === 0,
      struct(col(time).as("t"), col("_rid").as("i")))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val takeBefore = col("_prev").isNotNull &&
      (col("_next").isNull ||
        col(time) - col("_prev.t") <= col("_next.t") - col(time))
    unioned
      .withColumn("_prev", last(rightRow, ignoreNulls = true).over(wb))
      .withColumn("_next", first(rightRow, ignoreNulls = true).over(wf))
      .filter(col("_tag") === 1)
      .select(col("_lid").as(leftId), col(key), col(time),
        when(takeBefore, col("_prev.i")).otherwise(col("_next.i")).as(rightId),
        when(takeBefore, col("_prev.t")).otherwise(col("_next.t")).as("right_time"),
        when(takeBefore, lit("before"))
          .otherwise(when(col("_next").isNotNull, lit("after"))).as("side"))
  }
}
