package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General relational surface (SURVEY.md §2.3).
  *
  * Every query is pure DataFrame API so Catalyst gets full freedom:
  * filters sit directly on scans (pushdown), aggregates are
  * map-side-combinable, small dimension tables are explicitly
  * broadcast. All float outputs are rounded so results are
  * engine-portable; all outputs carry a total deterministic order.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1 style: multi-aggregate scan of lineitem. One shuffle on
    * a tiny group key (6 groups) after partial aggregation — at 100 TB
    * the reduce side is negligible; the scan dominates and prunes to
    * the 7 referenced columns.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ts("1998-09-01 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 style: customer ⋈ orders ⋈ lineitem, top revenue.
    * customer is small relative to the fact tables → broadcast; the
    * orders⋈lineitem join shuffles on orderkey only.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 style: 6-way star join. region/nation/customer/supplier
    * broadcast (all tiny); only orders⋈lineitem shuffles.
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") && col("o_orderdate") < ts("1997-01-01 00:00:00"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
  }

  /** TPC-H Q6 style: selective scan + single aggregate; everything is
    * pushed to the parquet reader (PushedFilters on shipdate bounds).
    */
  def q6Filter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Window functions: top-3 orders per customer by price.
    * Single shuffle on o_custkey; row_number with a full tiebreak.
    */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey"), col("o_totalprice"))
  }

  /** Hierarchical aggregate via ROLLUP (flag → flag+status → total). */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** Explicit GROUPING SETS — the two single-dimension marginals plus
    * the grand total, with NO pairwise cell: the grouping-set shape
    * rollup/cube can't express. One expand + one partial-aggregable
    * shuffle, same engine path as rollup.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** Left-semi join: customers having at least one order — the EXISTS
    * shape, emitting build-side columns only (no duplication by match
    * count, unlike an inner join + distinct).
    */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Time-RANGE window frame: per event, count and value-sum of the
    * same user's events in the trailing hour (RANGE BETWEEN interval
    * PRECEDING AND CURRENT ROW on the millisecond axis) — the sliding
    * frame class the row-frame queries don't cover. One shuffle on
    * user_id; the frame scan is a per-partition two-pointer pass.
    */
  def qRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t"))
      .rangeBetween(-3600000L, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("t", unix_millis(col("ts")))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_trail_1h"),
        round(sum("value").over(w), 2).as("sum_trail_1h"))
  }

  /** Global top-k users by total event value: partial agg per
    * partition, tiny shuffle, then a driver-cheap ordered limit.
    */
  def qTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)

  /** Gaps-and-islands sessionization: a session breaks after a 30-min
    * silence per user. Two window passes over one shuffle on user_id.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 30L * 60 * 1000, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Exact interpolated percentiles per event_type (matches DuckDB
    * quantile_cont). percentile() is exact — the scale path is
    * percentile_approx/t-digest; exact keeps the oracle comparable.
    */
  def qPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))

  /** CUBE over two dimensions — all 4 grouping combinations in one
    * pass (partial-agg friendly like rollup).
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))

  /** Anti join: customers with no orders. Broadcast-able build side
    * at small SF; at scale a shuffled left-anti on the key.
    */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Set ops: users seen in 'click' events but never in 'purchase'
    * events (EXCEPT), via distinct projections.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "click").select("user_id")
      .except(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Cohort RETENTION matrix: users grouped by their first-seen day,
    * distinct-active counts per (cohort, day offset) — the standard
    * engagement table every event pipeline materializes. Two
    * map-combinable aggregates + one join on user_id; exact integer
    * output (no float edge in the oracle).
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy("user_id").agg(min("d").as("cohort_d"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** The HLL swap of [[qRetention]], completing the day-axis approx
    * reach family ([[qRollingDauApprox]] / [[qRunningDistinctApprox]]):
    * the cohort assignment (per-user first-seen min — the shuffle that
    * DEFINES cohorts, irreducible in any rendering) stays exact; the
    * (cohort, offset) distinct-active count becomes one mergeable
    * sketch per matrix CELL, so the second data-sized shuffle — every
    * (cohort, offset, user) triple of the exact twin — collapses
    * map-side to |cells| register blocks. Same contract columns.
    */
  def qRetentionApprox(spark: SparkSession, dir: String,
                       lgK: Int = 14): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy("user_id").agg(min("d").as("cohort_d"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK))).as("n_users"))
  }

  /** FUNNEL conversion: per user with at least one click, did any
    * purchase land within `windowMs` after the FIRST click? The
    * anchored-existence shape (anchor event, then any qualifying
    * event in a trailing window) that conversion analytics is built
    * from. One aggregate for the anchor, one left join to purchases,
    * one max-of-indicator aggregate — all integer outputs.
    */
  def qFunnel(spark: SparkSession, dir: String,
              windowMs: Long = 3600000L): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(unix_millis(col("ts"))).as("c_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
    firstClick.join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "c_ms")
      .agg(max(when(col("p_ms") >= col("c_ms") &&
          col("p_ms") <= col("c_ms") + windowMs, 1).otherwise(0))
        .cast("long").as("converted"))
      .select(col("user_id"), col("c_ms").as("first_click_ms"), col("converted"))
  }

  /** MULTI-STAGE sequential funnel (view → click → purchase,
    * strictly ordered): per user, the first view, the first click
    * AFTER that view, and the first purchase AFTER that click, plus
    * the stage reached — the k-step generalization of [[qFunnel]]'s
    * anchored-existence shape. Each stage is a map-combinable min
    * aggregate over the stage-survivor join (stage N's frame is
    * keyed by stage N−1's survivors, so the joined side SHRINKS
    * monotonically down the funnel); no window over a user's whole
    * history, no per-user event list. Exact µs integers; strict
    * ordering (same-instant events don't chain), NULL stages render
    * as the reached-stage counter.
    */
  def qFunnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("view_us"))
      .groupBy("user_id").agg(min("us").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("click_us"))
      .groupBy("user_id").agg(min("us").as("purchase_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("view_us"), col("click_us"), col("purchase_us"),
        when(col("purchase_us").isNotNull, 3L)
          .when(col("click_us").isNotNull, 2L)
          .otherwise(1L).as("stage"))
  }

  /** INTERSECT: users seen in BOTH click and purchase events — the
    * other set-op branch (compiles to a left-semi over distincts,
    * one shuffle per side).
    */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Exact distinct counts (partial-agg distinct rewrite: Spark
    * expands to a two-phase aggregate; the scale path for loose
    * accuracy is approx_count_distinct/HLL, not oracle-comparable).
    */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("user_id"), col("event_type")).as("n_user_types"),
        count(lit(1)).as("n_events"))

  /** Statistical aggregates per event_type. Rounded to 4 — stddev /
    * correlation accumulate differently across engines (Welford
    * order), unlike plain sums.
    */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(stddev_samp(col("value")), 4).as("sd_value"),
        round(var_samp(col("value")), 4).as("var_value"),
        round(corr(col("value"), col("user_id").cast("double")), 4).as("corr_vu"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 4).as("cov_vu"))

  /** Skew-safe two-phase aggregation (salting): phase 1 aggregates on
    * (key, salt) so a hot key's rows spread over `salts` reducers;
    * phase 2 re-aggregates the per-salt partials on the key alone.
    * Result is identical to a plain groupBy (sums/counts are
    * associative) — the oracle checks that.
    */
  def qSaltedAgg(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    Tables.events(spark, dir)
      .withColumn("_salt", pmod(col("event_id"), lit(salts.toLong)))
      .groupBy("event_type", "_salt")
      .agg(sum("value").as("pv"), count(lit(1)).as("pn"))
      .groupBy("event_type")
      .agg(round(sum("pv"), 2).as("total_value"), sum("pn").cast("long").as("n_events"))

  /** Skew-safe SALTED equi-join: the big side's hot keys (5 event
    * types over 60k+ rows — a worst-case skew ratio) get a
    * deterministic per-row salt, the small side replicates to every
    * salt, and the join runs on (key, salt) so one hot key's rows
    * spread over `salts` reducer keys instead of one straggler task.
    * Result set is IDENTICAL to the unsalted join (each row still
    * meets exactly its key's dim row) — the oracle checks against
    * the plain join. At this SF Catalyst broadcasts the replicated
    * dim (40 rows) so no shuffle happens at all; at scale, when the
    * dim side outgrows broadcast and the plan becomes a shuffled
    * join, the salt is what keeps the hot key parallel. (AQE's
    * skew-join split is the automatic alternative; explicit salting
    * is the deterministic, engine-independent rendering.)
    *
    * The aggregate emits exact integers only (count + an
    * above-average indicator sum against the 4-dp-rounded per-type
    * mean), so the oracle compare has no float-summation edge.
    */
  def qSaltedJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.groupBy("event_type").agg(round(avg("value"), 4).as("type_avg"))
    val salted = ev.withColumn("_salt", pmod(xxhash64(col("event_id")), lit(salts.toLong)))
    val dimX = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(dimX, Seq("event_type", "_salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("type_avg"), 1).otherwise(0)).cast("long").as("n_above"))
  }

  /** PIVOT: per-priority order counts rotated to one column per
    * order status. The pivot value list is EXPLICIT — omitting it
    * makes Spark run a distinct-scan job just to discover columns,
    * a full extra pass at 100 TB. Missing cells coalesce to 0 (count
    * semantics).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** Scalar subquery: orders above their customer's average order
    * value — rewritten by Catalyst into an aggregate + join.
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val avgPerCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("k"))
      .agg(avg("o_totalprice").as("cust_avg"))
    Tables.orders(spark, dir)
      .join(avgPerCust, col("o_custkey") === col("k"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** NTILE quartile assignment per event_type — the rank-based
    * binning pass (feature bucketing, A/B cohort splits) that
    * complements [[qPercentile]]'s value-based cuts. ntile is a pure
    * function of row POSITION in the partition's sort, so a unique
    * (value, event_id) order makes the bucket ids engine-portable
    * with no float comparison at all (SQL-standard floor-based
    * bucket sizing on both engines). One shuffle on event_type.
    */
  def qNtile(spark: SparkSession, dir: String, buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        ntile(buckets).over(w).as("quartile"))
  }

  /** UNPIVOT (melt): the inverse of [[qPivot]] — rotate a wide
    * per-group aggregate (three integer measures per returnflag)
    * into (group, measure, value) long form, the shape metric stores
    * and plotting layers ingest. Map-only after the aggregate: each
    * wide row explodes to exactly |measures| narrow rows, no extra
    * shuffle. All-integer measures (no float edge).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("n_lines"), col("n_orders"), col("n_parts")),
      "measure", "v")
  }

  /** LEAD/LAG inter-event deltas: per event, milliseconds since the
    * user's previous event and until the next one (NULL at the
    * edges) — the event-stream feature the sessionizer's gap rule is
    * built from, exposed row-wise. One shuffle on user_id, two
    * offset-window functions over the same sort; all-integer output
    * (µs-truncated millis, no float edge).
    */
  def qLagDelta(spark: SparkSession, dir: String): DataFrame = {
    // order on the full-resolution ts (millis truncation could
    // reorder sub-ms neighbors), emit truncated-ms deltas
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), unix_millis(col("ts")).as("ts_ms"))
      .select(
        col("event_id"), col("user_id"),
        (col("ts_ms") - lag("ts_ms", 1).over(byUser)).as("ms_since_prev"),
        (lead("ts_ms", 1).over(byUser) - col("ts_ms")).as("ms_until_next"))
  }

  /** Fixed-width value HISTOGRAM per event_type (width_bucket
    * shape): bucket = floor(value / width), count + exact min/max
    * per cell. One map-combinable aggregate — the profiling scan
    * every pipeline runs before choosing filter thresholds. The
    * bucket id is engine-portable because IEEE division is
    * correctly rounded and floor is exact (no round() half-rule
    * edge — CLAUDE.md float rule); min/max pass raw doubles through
    * untouched (no summation, so no ordering sensitivity).
    */
  def qHistogram(spark: SparkSession, dir: String, width: Double = 10.0): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), floor(col("value") / width).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))

  /** ROWS-frame moving aggregate: per user, sum/count of the last 4
    * events (3 preceding + current) ordered by (ts, event_id) — the
    * sliding-window feature a rate-limiter or anomaly score consumes.
    * One shuffle on user_id, single window pass. The summed value is
    * pre-quantized to integer millis (floor(v·1000 + 0.5) — exact and
    * identical on any engine), because a sliding DOUBLE sum is
    * association-order-sensitive: engines that maintain the frame with
    * a segment tree would differ by ulps.
    */
  def qMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 1000.0 + 0.5).cast("long").as("v_milli"))
      .select(col("event_id"), col("user_id"),
        sum("v_milli").over(w).as("mv_sum_milli"),
        count(lit(1)).over(w).as("mv_n"))
  }

  /** Conditional (FILTER-style) aggregates: one scan, several
    * predicated counters per group — the shape monitoring rollups
    * take instead of N separate filtered scans. All counters are
    * exact integers; the value predicate compares a raw double to a
    * literal (IEEE-exact on any engine); the JSON field arrives via
    * the same codegen'd get_json_object as parse_props_json.
    */
  def qCondAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("n_high"),
        countDistinct(when(col("value") > 50.0, col("user_id"))).as("n_high_users"),
        sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("n_even_k"))

  /** Ordered string aggregation (LISTAGG shape): per event_type, the
    * csv of its 3 earliest event_ids. The candidate set is cut to 3
    * per key BEFORE aggregation (row_number window), so the collected
    * list is bounded by construction — collect_list over an unbounded
    * group would be the 100 TB mistake. Order inside the string comes
    * from sorting the (rnk, id) structs, not from shuffle luck.
    */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("ts"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .groupBy("event_type")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("rnk"), col("event_id")))),
          x => x.getField("event_id").cast("string"))).as("first3_ids"))
  }

  /** FIRST/LAST per key over the full partition frame: each user's
    * first and last event_type + timestamps and event count — the
    * profile row a user store materializes. One shuffle on user_id;
    * first/last are window functions over the (ts, event_id) total
    * order (unique tiebreak, so both engines pick the same rows).
    */
  def qFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"),
        row_number().over(ord).as("rn"),
        first(col("event_type")).over(full).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        unix_millis(first(col("ts")).over(full)).as("first_ms"),
        unix_millis(last(col("ts")).over(full)).as("last_ms"),
        count(lit(1)).over(full).as("n_events"))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Activity-gap profile: per user, the active-day count vs the
    * first→last span — surfacing engagement holes (a sequencing/
    * liveness check, the batch analog of a feed-down monitor). One
    * map-combinable aggregate over (user, day); all-integer output
    * (dates and day arithmetic, no float edge).
    */
  def qActivityGaps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(
        min(col("d")).as("first_day"),
        max(col("d")).as("last_day"),
        countDistinct(col("d")).as("n_active_days"))
      .select(col("user_id"), col("first_day"), col("last_day"),
        (datediff(col("last_day"), col("first_day")) + 1).cast("long").as("span_days"),
        col("n_active_days"),
        (datediff(col("last_day"), col("first_day")) + 1 - col("n_active_days"))
          .cast("long").as("n_gap_days"))

  /** FULL OUTER join of two per-user aggregates (clicks vs
    * purchases), with a coalesced key and a segment label — the
    * audience-overlap shape. Both sides pre-aggregate before the
    * join, so the shuffle carries one row per (user, side), and the
    * join key coalesces NULL-safely via the Seq-join.
    */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    clicks.join(purchases, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .withColumn("segment",
        when(col("n_clicks") > 0 && col("n_purchases") > 0, "both")
          .when(col("n_clicks") > 0, "click_only")
          .otherwise("purchase_only"))
  }

  /** CDC/upsert compaction keep-LATEST: one surviving row per
    * (user_id, event_type) — the mirror of dedup_first's first-wins
    * (Deduplicator.java:43-59 primes the FIRST arrival; a state-store
    * compaction keeps the LAST). The (ts, event_id) descending order
    * is a unique total order, so the survivor is deterministic on any
    * engine; the value passes through raw (no aggregation → no float
    * edge). One shuffle on the compaction key, one window pass.
    */
  def qCompactLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        unix_millis(col("ts")).as("last_ms"),
        col("value").as("last_value"))
  }

  /** Per-user modal event type — the categorical argmax profile
    * (dominant behavior per entity; the label a mixture or routing
    * pass keys on). One map-combinable count shuffle on
    * (user_id, event_type), then a per-user row_number argmax with
    * a (count DESC, event_type ASC) tie-break — integer counts and a
    * total order, so the winner is engine-deterministic.
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("modal_type"), col("n_events"))
  }

  /** SCD2-style dimension history: collapse each user's event_type
    * stream into consecutive RUNS — (user_id, run_id, event_type,
    * valid_from, valid_to, n_events), the slowly-changing-dimension
    * table a warehouse builds from a CDC/event feed (q_compact_latest
    * keeps only the final state; this keeps the full validity
    * history). Gaps-and-islands: a lag marks run starts, a running
    * sum numbers them, one groupBy collapses — two window passes and
    * one aggregate over the SAME (user_id → ts, event_id) sort, so
    * Catalyst plans a single sort+shuffle reused by all three.
    * Ordering axis: full-resolution ts with event_id tie-break (the
    * oracle orders on epoch_us(ts) — q_lag_delta's rule); boundary
    * timestamps emitted as integer millis.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull ||
          lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum("chg").over(run))
      .groupBy("user_id", "run_id", "event_type")
      .agg(
        min(unix_millis(col("ts"))).as("valid_from_ms"),
        max(unix_millis(col("ts"))).as("valid_to_ms"),
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event_id"))
  }

  /** Peak interval concurrency per event type — the sweep-line
    * answer to "how many 30-minute event windows were open at once,
    * and when did the peak first happen": every interval explodes to
    * a +1 open / −1 close delta, one ordered running sum per type
    * finds the max. Close sorts BEFORE open at the same instant
    * (delta asc) — half-open [ts, ts+30m) semantics, so touching
    * intervals don't double-count. All-integer (unix millis).
    *
    * Scale: the running sum is inherently a per-key ordered scan —
    * one shuffle on event_type, then a linear in-partition pass. A
    * single key's whole timeline lands in one partition (the same
    * bound [[qSessionize]] documents); the production split is
    * per-day partial sweeps + a carry-in prefix sum across days,
    * same plan shape one level down.
    */
  def qIntervalOverlap(spark: SparkSession, dir: String, winMs: Long = 1800000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts)").as("t0"))
    val deltas = ev.select(col("event_type"),
        explode(array(
          struct(col("t0").as("t"), lit(1L).as("delta")),
          struct((col("t0") + winMs).as("t"), lit(-1L).as("delta")))).as("d"))
      .select(col("event_type"), col("d.t").as("t"), col("d.delta").as("delta"))
    val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open", sum("delta").over(w))
      .withColumn("peak", max("open").over(Window.partitionBy("event_type")))
      .filter(col("open") === col("peak"))
      .groupBy("event_type")
      .agg(max("peak").as("peak_concurrency"), min("t").as("peak_at_ms"))
  }

  /** The PER-DAY CARRY-IN split of [[qIntervalOverlap]] — the scale
    * execution its scaladoc documents, now as code and
    * result-identical by construction. The single-sweep rendering
    * sorts each type's WHOLE timeline inside one window partition
    * (per-key-history-in-one-task, the qSessionize bound); here the
    * sweep partitions on (type, DAY): each day's deltas sort
    * independently (bounded by a day's traffic, embarrassingly
    * parallel across days), and each day reduces to three numbers —
    * its local peak prefix sum, that peak's first instant, and its
    * net delta sum. The cross-day dependency is then a prefix sum of
    * net sums on the DAY AXIS (types × days rows — calendar-bounded,
    * nothing like the corpus): carry_in(d) = Σ earlier days' nets,
    * and since open(t) = carry_in + local_open(t) for t in d,
    * day-peak = carry_in + local peak, the global peak is the max
    * over days and its first instant is the earliest achieving day's
    * local peak instant (timestamps increase with day). Same
    * (t, delta) close-before-open order inside each day, so the
    * half-open semantics are untouched — a delta at midnight simply
    * belongs to the new day's sweep.
    */
  def qIntervalOverlapDaily(spark: SparkSession, dir: String,
                            winMs: Long = 1800000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts)").as("t0"))
    val deltas = ev.select(col("event_type"),
        explode(array(
          struct(col("t0").as("t"), lit(1L).as("delta")),
          struct((col("t0") + winMs).as("t"), lit(-1L).as("delta")))).as("d"))
      .select(col("event_type"), col("d.t").as("t"), col("d.delta").as("delta"),
        expr("d.t div 86400000").as("day"))
    // one shuffle on (type, day); the three windows share its sort
    val wDay = Window.partitionBy("event_type", "day").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPart = Window.partitionBy("event_type", "day")
    val perDay = deltas
      .withColumn("local_open", sum("delta").over(wDay))
      .withColumn("local_peak", max("local_open").over(wPart))
      .withColumn("day_sum", sum("delta").over(wPart))
      .filter(col("local_open") === col("local_peak"))
      .groupBy("event_type", "day")
      .agg(max("local_peak").as("local_peak"), min("t").as("local_peak_at"),
        max("day_sum").as("day_sum"))
    // day-axis stitching runs on types x days rows only
    val wType = Window.partitionBy("event_type").orderBy("day")
    perDay
      .withColumn("carry_in", coalesce(
        sum("day_sum").over(wType.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("day_peak", col("carry_in") + col("local_peak"))
      .withColumn("peak", max("day_peak").over(Window.partitionBy("event_type")))
      .filter(col("day_peak") === col("peak"))
      .groupBy("event_type")
      .agg(max("peak").as("peak_concurrency"), min("local_peak_at").as("peak_at_ms"))
  }

  /** Day-of-week × hour activity heatmap — the traffic-shape profile
    * behind capacity planning and anomaly baselines. Deliberately
    * PURE INTEGER EPOCH MATH (dow = (epoch_days + 4) mod 7 with
    * 0 = Sunday — 1970-01-01 was a Thursday; hour = in-day millis
    * div 3600000, UTC): engine date functions differ in locale
    * conventions (DOW numbering, week start), integer division
    * doesn't. One map-combinable count on ≤ 168 keys.
    */
  def qTimeProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(expr("unix_millis(ts)").as("ms"), col("value"))
      .select(expr("((ms div 86400000) + 4) % 7").as("dow"),
        expr("(ms % 86400000) div 3600000").as("hour"),
        col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Benford first-digit audit over order totals — the
    * data-integrity screen auditors run on money columns (organic
    * amounts track log-uniform first digits; fabricated or
    * clipped data bulges). Pure map-combinable shape: first digit
    * extracted per row by integer string math, one 9-key count, the
    * observed share an exact ×10⁶ integer floor against the total.
    * The ideal Benford curve is the CONSUMER's overlay — emitting
    * log10 floats here would only import libm cross-engine noise.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val counts = Tables.orders(spark, dir)
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div total").as("share_x1e6"))
  }

  /** Sketch aggregates — the approximate family that makes exact-
    * unaffordable questions answerable at 100 TB: HyperLogLog++
    * distinct counts and KLL-style quantiles are one map-combinable
    * pass with a CONSTANT-size state per group (vs exact distinct's
    * per-key shuffle of every value and exact percentile's full
    * sort). NOT on the DuckDB oracle gate: sketch internals are
    * engine-specific (DuckDB's HLL ≠ Spark's), so equality-replay is
    * impossible by construction — correctness is the published error
    * bound, asserted against the exact aggregates in ScalaTest
    * (AggregateSketchSpec), same contract as the streaming rows.
    *
    * `rsd` is the HLL++ standard-error knob (state ≈ 1.04/rsd²
    * registers); `accuracy` the percentile_approx bound (error ≤
    * 1/accuracy of the rank).
    */
  def qSketchProfile(spark: SparkSession, dir: String,
                     rsd: Double = 0.02, accuracy: Int = 10000): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(accuracy)).as("approx_p"),
        count(lit(1)).as("n_events"))

  /** The ranking-function family over one window — rank, dense_rank,
    * percent_rank, cume_dist side by side (the remaining ANSI window
    * rank functions; row_number/ntile live in their own queries).
    * One shuffle on the partition key. Ordering is on exact cents
    * (ties are REAL and semantically meaningful to rank vs
    * dense_rank); percent_rank/cume_dist divide exact small integers
    * — one correctly-rounded IEEE op each, rounded for display.
    */
  def qRankFamily(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy("o_custkey").orderBy("cents")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
      .select(col("o_orderkey"), col("o_custkey"), col("cents"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** Gap-filled 15-minute time series per event type — the
    * densification pass a monitoring/feature pipeline runs so
    * downstream window math sees EVERY bucket, including empty ones
    * (a raw groupBy silently drops them). Shape: one map-combinable
    * aggregate on (event_type, bucket), then the per-type [min, max]
    * bucket span explodes into the dense grid via `sequence` (grid
    * cardinality = types × span/step — bounded by the time range, not
    * the row count), and the big aggregated side joins back on the
    * grid's equi-key. At 100 TB the raw scan collapses to the bucket
    * aggregate before anything joins; the grid side stays tiny and
    * broadcastable. All-integer bucket arithmetic; sums emitted in
    * exact cents.
    */
  def qTimeBucket(spark: SparkSession, dir: String, stepMs: Long = 900000L): DataFrame = {
    val agg = Tables.events(spark, dir)
      .select(col("event_type"),
        expr(s"(unix_millis(ts) div $stepMs) * $stepMs").as("bucket_ms"),
        col("value"))
      .groupBy("event_type", "bucket_ms")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
    val grid = agg.groupBy("event_type")
      .agg(min("bucket_ms").as("lo"), max("bucket_ms").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(stepMs))).as("bucket_ms"))
    grid.join(agg, Seq("event_type", "bucket_ms"), "left")
      .select(col("event_type"), col("bucket_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"),
        col("n_events").isNull.as("is_gap"))
  }

  /** Conversion-LATENCY distribution per source touch type: for
    * every purchase attributed within the 30-min window (the
    * [[qAttribution]] rule), the time-to-convert, reduced to exact
    * discrete p10/p50/p90 order statistics per src_type (the
    * latency table next to [[qFunnel]]'s conversion counts — counts
    * say HOW MANY convert, this says HOW FAST). Same one-window
    * attribution pass, then the shared rank-pick rendering on the
    * unique (gap_ms, event_id) axis. All-integer.
    */
  def qConversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val wAttr = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("src", last(when(col("event_type") =!= "purchase",
        struct(col("us"), col("event_type"))), ignoreNulls = true).over(wAttr))
      .filter(col("event_type") === "purchase" && col("src").isNotNull &&
        col("us") - col("src.us") <= lit(30L * 60 * 1000000))
      .select(col("event_id"), col("src.event_type").as("src_type"),
        expr("(us - src.us) div 1000").as("gap_ms"))
    val w = Window.partitionBy("src_type").orderBy(col("gap_ms"), col("event_id"))
    attributed
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("src_type")).cast("long"))
      .groupBy("src_type")
      .agg(max("n").as("n_conversions"),
        max(when(col("rn") === expr("(n * 10 + 99) div 100"), col("gap_ms"))).as("p10_ms"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("gap_ms"))).as("p50_ms"),
        max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("gap_ms"))).as("p90_ms"))
  }

  /** Gap-fill + FORWARD-FILL time series — [[qTimeBucket]]'s dense
    * grid with the last-observed aggregate carried into empty
    * buckets (the staleness-tolerant rendering every dashboard and
    * feature-store materialization wants: "value as of bucket t").
    * The carry is one `last(ignoreNulls)` over the per-type
    * bucket-ordered frame — the grid is calendar-bounded, so the
    * window side is tiny regardless of corpus size; the raw scan
    * still collapses to the bucket aggregate first.
    */
  def qGapFfill(spark: SparkSession, dir: String, stepMs: Long = 900000L): DataFrame = {
    val agg = Tables.events(spark, dir)
      .select(col("event_type"),
        expr(s"(unix_millis(ts) div $stepMs) * $stepMs").as("bucket_ms"),
        col("value"))
      .groupBy("event_type", "bucket_ms")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
    val grid = agg.groupBy("event_type")
      .agg(min("bucket_ms").as("lo"), max("bucket_ms").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(stepMs))).as("bucket_ms"))
    val w = Window.partitionBy("event_type").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "bucket_ms"), "left")
      .withColumn("ffill_cents", last(col("value_cents"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("bucket_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("value_cents"), col("ffill_cents"),
        col("n_events").isNull.as("is_gap"))
  }

  /** Golden-record SURVIVORSHIP merge — the MDM/CDC consolidation
    * pass: one row per user carrying, for each field, the value from
    * the LATEST event where that field is meaningful (purchases
    * carry spend, errors carry a timestamp, clicks carry the props
    * payload). Conditional `last(ignoreNulls)` carries over ONE
    * full-frame per-user window — no per-field self-joins, one
    * shuffle; the newest-row filter reuses the same sort.
    */
  def qGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
      .withColumn("last_purchase_cents",
        last(when(col("event_type") === "purchase", col("cents")), ignoreNulls = true).over(full))
      .withColumn("last_error_us",
        last(when(col("event_type") === "error", col("us")), ignoreNulls = true).over(full))
      .withColumn("last_click_k",
        last(when(col("event_type") === "click", col("k")), ignoreNulls = true).over(full))
      .withColumn("last_type", last(col("event_type"), ignoreNulls = true).over(full))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("last_type"),
        col("last_purchase_cents"), col("last_error_us"), col("last_click_k"))
  }

  /** Correlated-subquery shape: orders priced strictly above their
    * own customer's average order value (`WHERE o_totalprice >
    * (SELECT avg(...) FROM orders o2 WHERE o2.o_custkey =
    * o.o_custkey)`), decorrelated the way Catalyst rewrites it — one
    * per-customer aggregate joined back on the correlation key, so
    * the fact table shuffles once on o_custkey and the filter runs
    * stream-side. The mean test is exact integer cross-multiplication
    * (cents·n > Σcents — prices are 2-decimal), so no float-summation
    * ulp can flip a borderline row on either engine; the displayed
    * average is FLOOR division of two exact integers (×10⁴ dollars) —
    * a float `round(·, 4)` here sat exactly on a half-way point at
    * sf0.01 and split across engines.
    */
  def qCorrSubquery(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
    val perCust = orders.groupBy("o_custkey")
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n_orders"))
    orders.join(perCust, "o_custkey")
      .filter(col("cents") * col("n_orders") > col("sum_cents"))
      .select(col("o_orderkey"), col("o_custkey"),
        (col("cents").cast("double") / 100.0).as("o_totalprice"),
        col("n_orders"),
        expr("(sum_cents * 100) div n_orders").as("cust_avg_x10000"))
  }

  /** Event-type transition matrix — the first-order Markov profile of
    * user behavior (session-flow analysis, anomaly baselines, and the
    * curriculum/ordering statistics a sequence-data pipeline reports).
    * Each user's events are ordered on the MICROSECOND epoch axis
    * with event_id tie-break (Spark timestamps are µs; ordering on the
    * raw timestamp would tie-break differently from an engine that
    * keeps nanos — the q_lag_delta lesson), `lag` pairs each event
    * with its predecessor, and one map-combinable count lands on the
    * tiny types×types key space. Shares are exact ×10⁴ integer floors
    * against the broadcast total — no float division.
    *
    * Scale: one shuffle on user_id for the window sort (per-user
    * timelines are watermark-bounded in practice), then a ≤ |types|²
    * aggregate — reduce side is constant-size regardless of corpus.
    */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 10000) div total").as("share_x1e4"))
  }

  /** Rolling 7-day active users per day (DAU/WAU + stickiness) — the
    * engagement family where the naive rendering (per-day COUNT
    * DISTINCT over a sliding self-join window) explodes at scale.
    * Shape here: dedup to distinct (day, user) FIRST (one
    * map-combinable distinct over day×user — the only data-sized
    * shuffle), then each active day CONTRIBUTES itself to the next 7
    * target days via a bounded ×7 `sequence` explode, a second
    * distinct collapses multi-active users per target window, and the
    * trailing distinct count becomes a plain count. Equi-keys
    * everywhere — no range self-join, no theta join; the explode
    * factor is the window length, a constant. Stickiness = exact
    * ×10⁴ integer floor of DAU/WAU. Only days with activity are
    * emitted (inner join), each with its full trailing window.
    */
  def qRollingDau(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .distinct()
      // consumed by both the DAU agg and the WAU explode: lazy-
      // checkpoint so the corpus scan + dedup shuffle run once
      .localCheckpoint(eager = false)
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_x1e4"))
  }

  /** Cumulative distinct-user reach by day — "how many unique users
    * has the product EVER seen as of day d". Exact running distinct
    * is unaffordable as a per-day COUNT DISTINCT over growing
    * prefixes; the decomposition is the standard one: a user counts
    * only on their FIRST-SEEN day (one map-combinable min per user —
    * the only data-sized shuffle), days collapse to new-user counts,
    * and the running total is a prefix sum over the tiny day axis.
    * The final window is unpartitioned by construction (one row per
    * day, bounded by the calendar, not the corpus) — the same
    * single-partition tail every cumulative report ends in.
    */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(min(expr("unix_millis(ts) div 86400000")).as("day"))
    val perDay = firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cum_users", sum("new_users").over(w))
  }

  /** Per-day mergeable HLL reach sketches — the shared substrate of
    * the day-axis approx reach family ([[qRollingDauApprox]],
    * [[qRunningDistinctApprox]]): ONE DataSketches HLL per day over
    * user_id (`hll_sketch_agg` — unlike `approx_count_distinct`, the
    * sketch VALUE is exposed, so downstream windows/explodes merge
    * REGISTERS instead of re-touching users). The aggregate is
    * map-side combinable: the day-groupBy shuffle carries
    * partitions × |days| constant-size register blocks, never a
    * (day, user) pair — which is the entire 100 TB story, because the
    * exact family's first shuffle is the distinct over day×user and
    * it is the only data-sized stage either query has.
    */
  private def dayUserSketches(spark: SparkSession, dir: String,
                              lgK: Int): DataFrame =
    Tables.events(spark, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))

  /** The 100 TB HLL swap of [[qRollingDau]] — same output contract
    * (day, dau, wau, stickiness ×10⁴), sketched cardinalities. The
    * exact rendering's ×7 contribution explode multiplies the
    * distinct (day, user) PAIR table; here the explode runs over the
    * per-day SKETCH table (|days| rows) and the window merge is
    * `hll_union_agg` over ≤7 register blocks per target day — the
    * whole reach family after the first aggregate is calendar-sized,
    * not corpus-sized. This is the first exact-distinct a 100 TB
    * engagement pipeline actually chokes on (VERDICT r6), swapped on
    * the [[profileApprox]] pattern: rsd-bound ScalaTest contract vs
    * the exact twin + a no-exact-fallback plan pin (engine-specific
    * sketches can't equality-replay in DuckDB).
    *
    * lgK=14 ⇒ ~1.6% rsd, 16 KiB registers per day — at 10 years of
    * days the whole sketch table is ~60 MiB, driver-broadcastable.
    */
  def qRollingDauApprox(spark: SparkSession, dir: String,
                        lgK: Int = 14): DataFrame = {
    val daySk = dayUserSketches(spark, dir, lgK)
      // consumed by both the DAU estimate and the WAU explode: lazy-
      // checkpoint so the corpus scan + sketch shuffle run once
      .localCheckpoint(eager = false)
    val dau = daySk.select(col("day"), hll_sketch_estimate(col("sk")).as("dau"))
    val wau = daySk
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("sk"))
      .groupBy("day").agg(hll_union_agg(col("sk")).as("usk"))
      .select(col("day"), hll_sketch_estimate(col("usk")).as("wau"))
    // inner join keeps the exact twin's contract: only days with
    // activity are emitted, each with its full trailing window
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_x1e4"))
  }

  /** The 100 TB HLL swap of [[qRunningDistinct]] — cumulative
    * distinct-user reach from a running UNION of the per-day
    * sketches: the prefix window runs over the bounded day axis
    * (exactly like the exact twin's prefix sum) but merges register
    * blocks, so no per-user min pass and no user-keyed shuffle exist
    * anywhere in the plan. new_users falls out as the difference of
    * consecutive cumulative estimates (HLL union estimates are
    * monotone over nested prefixes in expectation but not pointwise —
    * clamped at 0 so a register estimation dip can't report negative
    * arrivals; the rsd contract covers cum_users, the analyst-facing
    * number). Axis note: this emits every ACTIVE day — a superset of
    * the exact twin's axis, which only materializes days contributing
    * a first-seen user (an artifact of its decomposition).
    */
  def qRunningDistinctApprox(spark: SparkSession, dir: String,
                             lgK: Int = 14): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dayUserSketches(spark, dir, lgK)
      .withColumn("cum_users", hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
      .withColumn("new_users",
        greatest(col("cum_users") - coalesce(lag("cum_users", 1).over(Window.orderBy("day")), lit(0L)), lit(0L)))
      .select(col("day"), col("new_users"), col("cum_users"))
  }

  /** Per-type 2σ outlier flags with EXACT integer arithmetic — the
    * anomaly gate a monitoring pipeline runs on every value column.
    * |x − μ| > 2σ is evaluated as the cross-multiplied integer test
    * (n·x − Σ)² > 4·(n·Σx² − Σ²): no float mean, no sqrt, no
    * engine-divergent rounding anywhere. The squared sides exceed
    * int64 (n·x ≈ 5·10⁹ at sf0.1 squares past 2⁶³) so they widen to
    * DECIMAL(38,0) — Spark's decimal128, DuckDB's HUGEINT — which
    * holds to n ≈ 10⁹ rows/type; past that the scale path is
    * per-partition Welford merge (float) with a documented tolerance.
    *
    * Scale: one map-combinable stats pass (5 groups), stats broadcast
    * back onto the stream — the event scan stays map-only.
    */
  def qAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        sum(expr("cents * cents")).as("sumsq"))
    val d = (col("n") * col("cents") - col("sum_cents")).cast("decimal(38,0)")
    val varN2 = // n²·σ² = n·Σx² − Σ², in decimal128
      col("n").cast("decimal(38,0)") * col("sumsq").cast("decimal(38,0)") -
        col("sum_cents").cast("decimal(38,0)") * col("sum_cents").cast("decimal(38,0)")
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("cents"),
        (d * d > lit(4).cast("decimal(38,0)") * varN2).as("is_outlier"))
  }

  /** Spend-concentration (Pareto) decile table: rank purchasers by
    * exact spend, cut into 10 rank deciles, report each decile's user
    * count, spend, and cumulative ×10⁴ share. The global rank is the
    * part that breaks naively at scale (an unpartitioned window is a
    * single-partition sort), so it's computed DISTRIBUTED: range-
    * repartition on the sort key, rank within each partition in
    * parallel, then add per-partition offsets (a #partitions-row
    * prefix sum, broadcast back). The only single-partition window
    * left runs over ≤ 32 offset rows and 10 decile rows.
    */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("spend_cents"))
    val parted = spend
      .repartitionByRange(32, col("spend_cents").desc, col("user_id"))
      .withColumn("pid", spark_partition_id())
    val local = parted.withColumn("lrn",
      row_number().over(Window.partitionBy("pid")
        .orderBy(col("spend_cents").desc, col("user_id"))).cast("long"))
      // consumed twice (offset counts + rank join): lazy-checkpoint so
      // the agg + range sort + window run ONCE, not once per branch
      // (no exchange reuse across a broadcast boundary)
      .localCheckpoint(eager = false)
    val cnts = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
    val offsets = cnts // ≤ 32 rows: the single-partition window is bounded
      .withColumn("off", coalesce(sum("cnt").over(
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nu", sum("cnt").over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val ranked = local.join(broadcast(offsets.select("pid", "off", "nu")), "pid")
      .withColumn("rn", col("off") + col("lrn"))
    val deciles = ranked
      .groupBy(expr("((rn - 1) * 10) div nu").as("decile"))
      .agg(count(lit(1)).as("n_users"), sum("spend_cents").as("spend_cents"))
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = deciles.agg(sum("spend_cents").as("total"))
    deciles.withColumn("cum_spend_cents", sum("spend_cents").over(w))
      .crossJoin(broadcast(total))
      .select(col("decile"), col("n_users"), col("spend_cents"), col("cum_spend_cents"),
        expr("(cum_spend_cents * 10000) div total").as("cum_share_x1e4"))
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent PRIOR non-purchase event, with the gap in ms and a
    * 30-minute attribution-window flag. One per-user window pass —
    * `last(..., ignoreNulls)` over rows [unbounded, −1) carries the
    * latest non-purchase (us, event_id, type) struct forward, so no
    * self-join and no per-row scan-back; ordering is the shared
    * (µs, event_id) axis. Purchases with no prior touch keep NULL
    * source columns and within_30m = false.
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("src", last(when(col("event_type") =!= "purchase",
        struct(col("us"), col("event_id"), col("event_type"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("src.event_id").as("src_event_id"),
        col("src.event_type").as("src_type"),
        expr("(us - src.us) div 1000").as("gap_ms"),
        coalesce(col("us") - col("src.us") <= lit(30L * 60 * 1000000), lit(false))
          .as("within_30m"))
  }

  /** Shuffle-key skew audit — the profile you run BEFORE choosing a
    * join strategy: per-key row counts collapsed into power-of-two
    * buckets (bucket = ⌊log₂ n⌋ + 1, computed engine-portably as the
    * binary-string length), with each bucket's key count, row mass,
    * heaviest key, and ×10⁴ row share. A long tail in high buckets
    * is the signal to salt ([[qSaltedJoin]]) or broadcast. Two
    * map-combinable aggregates; reduce side ≤ 64 bucket rows.
    */
  def qSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.events(spark, dir).groupBy("user_id").agg(count(lit(1)).as("n"))
    val hist = keys.groupBy(length(bin(col("n"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"), max("n").as("max_key_rows"))
    val total = hist.agg(sum("n_rows").as("total"))
    hist.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_keys"), col("n_rows"), col("max_key_rows"),
        expr("(n_rows * 10000) div total").as("rows_share_x1e4"))
  }

  /** Generic single-pass column profile: row count, null count, and
    * exact distinct cardinality per column — the data-quality audit
    * every ingest runs first. ONE aggregate over the scan (Spark
    * expands the multi-distinct into one Expand + partial aggs — no
    * per-column rescans), stacked to long form. At 100 TB swap
    * count_distinct for approx_count_distinct (HLL) per column; the
    * contract shape is unchanged.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c")))
    val stacked = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"),
        expr(s"stack(${cols.size}, $stacked) AS (col_name, n_nonnull, n_distinct)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"), col("n_distinct"))
  }

  /** [[profile]] applied to the events stream table. */
  def qColProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.events(spark, dir),
      Seq("user_id", "event_type", "value", "props"))

  /** The 100 TB rendering of [[profile]]: identical output contract
    * (one row per column: rows / nulls / distinct) with the distinct
    * cardinality as an HLL++ sketch (`approx_count_distinct`)
    * instead of exact `count_distinct`. The difference in plan
    * shape is the whole point at scale — exact multi-distinct
    * expands the scan (one Expand row per distinct column) and
    * shuffles EVERY (column, value) pair to dedup it, while the
    * sketch is a constant ≈1.04/rsd² registers per column, merged
    * map-side: the profile becomes a single partial-aggregate pass
    * whose shuffle is K sketch payloads, independent of data volume.
    * Correctness contract is the published rsd bound, asserted
    * against the exact twin in ScalaTest (engine-specific sketch ⇒
    * no DuckDB equality replay, same adjudication as
    * [[qSketchProfile]]).
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.02): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"nd_$c")))
    val stacked = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"),
        expr(s"stack(${cols.size}, $stacked) AS (col_name, n_nonnull, n_distinct_approx)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"), col("n_distinct_approx"))
  }

  /** [[profileApprox]] applied to the events stream table — the
    * approx twin of [[qColProfile]].
    */
  def qColProfileApprox(spark: SparkSession, dir: String,
                        rsd: Double = 0.02): DataFrame =
    profileApprox(Tables.events(spark, dir),
      Seq("user_id", "event_type", "value", "props"), rsd)

  /** Interval UNION per type: each event opens a 30-min interval;
    * overlapping/touching intervals coalesce into maximal spans
    * (uptime/coverage reporting — the complement of
    * [[qIntervalOverlap]]'s peak concurrency). Classic running-max
    * sweep: an interval starts a new span iff its t0 exceeds the max
    * end of every earlier interval; span ids are the running sum of
    * those breaks. Both windows share one (event_type | t0,
    * event_id) sort — a single shuffle, no self-join. All integer
    * ms; at corpus scale per-type timelines split by day with
    * carry-in spans (same note as qIntervalOverlap).
    */
  def qMergeIntervals(spark: SparkSession, dir: String): DataFrame = {
    val dur = 1800000L
    val ord = Window.partitionBy("event_type").orderBy(col("t0"), col("event_id"))
    val prevMax = max("t1").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), expr("unix_millis(ts)").as("t0"))
      .withColumn("t1", col("t0") + dur)
      .withColumn("is_new", coalesce(col("t0") > prevMax, lit(true)))
      .withColumn("span_id", sum(col("is_new").cast("long"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type", "span_id")
      .agg(min("t0").as("span_start_ms"), max("t1").as("span_end_ms"),
        count(lit(1)).as("n_events"))
  }

  /** The PER-DAY SPLIT of [[qMergeIntervals]] — its scaladoc's scale
    * note as code, result-identical by construction. Level 1 runs
    * the running-max coalesce inside (type, DAY) partitions (each
    * day's intervals sort independently — bounded, parallel across
    * days) and collapses every day to its local maximal spans
    * (start, max-end, member count). Level 2 re-runs the SAME sweep
    * at span granularity over one (type) partition — but on the
    * post-coalesce span rows, orders of magnitude below the event
    * count (a day of dense traffic is a handful of spans), stitching
    * boundary-crossing spans across any number of days. Equality:
    * an interval joins its local span exactly when it would join the
    * global one (the local prefix max is a lower bound of the global
    * that only differs when a prior span absorbs the gap — which the
    * stitch then merges), span starts are strictly increasing so the
    * stitched order IS the global order, and ids/boundaries/counts
    * aggregate identically (equality spec + shared replay).
    */
  def qMergeIntervalsDaily(spark: SparkSession, dir: String): DataFrame = {
    val dur = 1800000L
    val ordLoc = Window.partitionBy("event_type", "day").orderBy(col("t0"), col("event_id"))
    val prevMaxLoc = max("t1").over(ordLoc.rowsBetween(Window.unboundedPreceding, -1))
    val locSpans = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), expr("unix_millis(ts)").as("t0"))
      .withColumn("t1", col("t0") + dur)
      .withColumn("day", expr("t0 div 86400000"))
      .withColumn("is_new", coalesce(col("t0") > prevMaxLoc, lit(true)))
      .withColumn("loc_span", sum(col("is_new").cast("long"))
        .over(ordLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type", "day", "loc_span")
      .agg(min("t0").as("s"), max("t1").as("e"), count(lit(1)).as("n"))
    // level 2: the same sweep over the reduced span rows
    val ordSpan = Window.partitionBy("event_type").orderBy(col("s"))
    val prevMaxSpan = max("e").over(ordSpan.rowsBetween(Window.unboundedPreceding, -1))
    locSpans
      .withColumn("is_new", coalesce(col("s") > prevMaxSpan, lit(true)))
      .withColumn("span_id", sum(col("is_new").cast("long"))
        .over(ordSpan.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type", "span_id")
      .agg(min("s").as("span_start_ms"), max("e").as("span_end_ms"),
        sum("n").as("n_events"))
  }

  /** Exact DISTINCT counts under GROUPING SETS — distinct users per
    * type, per day, and overall in ONE logical pass (the audience
    * marginals report). Spark expands the sets then plans the
    * distinct via partial aggregation on (gid, key, user); no
    * per-marginal rescans. At 100 TB the swap is HLL sketches
    * (approx_count_distinct merges map-side; same contract shape).
    */
  def qDistinctRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
        col("user_id"))
      .groupingSets(Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
        col("event_type"), col("day"))
      .agg(count_distinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** The 100 TB rendering of [[qDistinctRollup]]: the same grouping
    * sets (per-type / per-day / total audience marginals) with the
    * distinct-user count as an HLL++ sketch. Exact multi-marginal
    * distinct shuffles every (gid, key, user) triple before it can
    * dedup — the user column rides the Expand fan-out through the
    * exchange; the sketch version collapses map-side to one
    * constant-size register block per (gid, key), so the shuffle
    * carries |types| + |days| + 1 sketches regardless of corpus
    * size. n_events stays exact (plain map-combinable count — no
    * reason to approximate it). rsd-bound contract vs the exact
    * twin in ScalaTest, like [[profileApprox]].
    */
  def qDistinctRollupApprox(spark: SparkSession, dir: String,
                            rsd: Double = 0.02): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
        col("user_id"))
      .groupingSets(Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
        col("event_type"), col("day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"),
        count(lit(1)).as("n_events"))

  /** Single change-point detection (CUSUM / binary-segmentation
    * score) on each type's daily volume — "which day did the feed
    * change": the split k maximizing |k-prefix mean − overall mean|,
    * cross-multiplied to the exact integer score |m·S_k − k·S| (no
    * division, no floats). The windows run on the DAY axis (rows per
    * type = days, calendar-bounded), so the expensive part is only
    * the daily count — one map-combinable aggregate over the corpus.
    * Peak day resolves to the EARLIEST day at max score.
    */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("sk", sum("x").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("s", sum("x").over(wAll))
      .filter(col("k") < col("m")) // a split needs both sides non-empty
      .withColumn("score", abs(col("m") * col("sk") - col("k") * col("s")))
      .withColumn("peak", max("score").over(wAll))
      .filter(col("score") === col("peak"))
      .groupBy("event_type")
      .agg(min("day").as("split_day"), max("peak").as("score"), max("m").as("n_days"))
  }

  /** Median absolute deviation per type — the robust spread partner
    * of [[qWinsorize]]'s robust center: MAD = median(|x − median(x)|),
    * both medians EXACT discrete order statistics (rank ⌈n/2⌉ on a
    * unique axis). Two rank passes — the second sorts the derived
    * deviations, which no single-pass trick avoids exactly; the
    * ranked base is lazy-checkpointed so the scan + first sort run
    * once. All-integer end to end.
    */
  def qMad(spark: SparkSession, dir: String): DataFrame = {
    val w1 = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
    val ranked = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(w1).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")).cast("long"))
      .localCheckpoint(eager = false) // median pass + deviation pass
    val med = ranked.groupBy("event_type")
      .agg(max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents"))).as("median_cents"))
    val w2 = Window.partitionBy("event_type").orderBy(col("dev"), col("event_id"))
    ranked.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("cents") - col("median_cents")))
      .withColumn("rn2", row_number().over(w2).cast("long"))
      .groupBy("event_type")
      .agg(max("n").as("n"), max("median_cents").as("median_cents"),
        max(when(col("rn2") === expr("(n * 50 + 99) div 100"), col("dev"))).as("mad_cents"))
  }

  /** Cohort LTV curve: per (first-seen week, weeks-since) cell, the
    * cohort's buyer count, spend, cumulative spend, and per-member
    * lifetime value — the growth-analytics staple next to
    * [[qRetention]]'s activity matrix. First-seen decomposition (one
    * min per user — the only data-sized shuffle besides the spend
    * join), cohort sizes broadcast back, cumulative window on the
    * tiny (cohort × age) grid. LTV is an exact ×100 integer floor of
    * cents over members.
    */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts) div 604800000").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cwk"))
    val sizes = cohort.groupBy("cwk").agg(count(lit(1)).as("cohort_size"))
    val cells = ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cwk"), (col("wk") - col("cwk")).as("age_wk"))
      .agg(count_distinct(col("user_id")).as("n_buyers"),
        sum("cents").as("spend_cents"))
    val w = Window.partitionBy("cwk").orderBy("age_wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_spend_cents", sum("spend_cents").over(w))
      .join(broadcast(sizes), "cwk")
      .select(col("cwk").as("cohort_wk"), col("age_wk"), col("cohort_size"),
        col("n_buyers"), col("spend_cents"), col("cum_spend_cents"),
        expr("(cum_spend_cents * 100) div cohort_size").as("ltv_cents_x100"))
  }

  /** Winsorized (clamped) robust mean per type — the outlier-proof
    * aggregate a metrics pipeline reports next to the raw mean. The
    * clamp bounds are EXACT discrete order statistics (element at
    * rank ⌈q·n/100⌉ on the unique (cents, event_id) axis — the
    * [[TextAnalysis.docsLengthProfile]] rule), broadcast back onto
    * the ranked pass; means are ×100 integer floors. One sort per
    * type feeds both the bounds and the clamped aggregate — a second
    * scan-free pass. All-integer end to end.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
    val ranked = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")).cast("long"))
      .localCheckpoint(eager = false) // consumed by bounds AND clamp
    val bounds = ranked.groupBy("event_type")
      .agg(max(when(col("rn") === expr("(n * 5 + 99) div 100"), col("cents"))).as("p05"),
        max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("cents"))).as("p95"))
    ranked.join(broadcast(bounds), "event_type")
      .withColumn("clamped", least(greatest(col("cents"), col("p05")), col("p95")))
      .groupBy("event_type")
      .agg(max("n").as("n"), max("p05").as("p05"), max("p95").as("p95"),
        expr("(sum(cents) * 100) div max(n)").as("raw_mean_x100"),
        expr("(sum(clamped) * 100) div max(n)").as("wins_mean_x100"))
  }

  /** Second-order path profile: (t₁ → t₂ → t₃) trigram counts over
    * each user's event sequence — one step deeper than
    * [[qTransitions]]' Markov matrix (detects order-dependent flows a
    * first-order model cannot, e.g. view→click→purchase vs
    * click→view→purchase). Two lags over ONE shared (µs, event_id)
    * sort, then a map-combinable count onto the ≤ |types|³ key space
    * — reduce side constant-size regardless of corpus.
    */
  def qPathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** HAVING-subquery join (TPC-H Q18 "large orders" shape): orders
    * whose lineitem quantity total clears a threshold, joined back to
    * orders + customer for the report columns. The having-aggregate
    * runs FIRST (map-combinable, shrinks lineitem to qualifying
    * orderkeys) so the join fan-in is the filtered set, not the fact
    * table; quantities are integral doubles cast exact to BIGINT.
    */
  def qHavingJoin(spark: SparkSession, dir: String, minQty: Long = 200): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("sum_qty"))
  }
}
