package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H completion wave: the classic decision-support shapes the
  * §2.3 surface did not yet cover, adapted to the testdata star
  * schema (no partsupp / commitdate / shipmode columns, so Q2, Q4,
  * Q9, Q11-12, Q15-16, Q20-21 are re-expressed against the columns
  * that exist; the join/aggregation shape — the thing that matters
  * for the engine — is preserved).
  *
  * Numeric contract (CLAUDE.md float rule): money is quantized to
  * exact BIGINT cents per row (`round(x * 100)` of an identical IEEE
  * double product on both engines) before any ratio; shares are
  * floor(1e4 * num / den) integer divisions of positive longs, so
  * every reported value replays bit-exactly in DuckDB. Display sums
  * stay in the file-wide `round(sum(...), 2)` convention.
  *
  * Scale posture: every dimension side (customer 15k/SF, supplier
  * 1k/SF, part 20k/SF, nation, region) is broadcast; the only
  * shuffles are lineitem⋈orders on orderkey and the final small
  * groupBy — the same plan a 100 TB run wants. Aggregates are
  * map-combinable (sum/count of longs).
  */
object Tpch {
  private def ts(s: String): Column = to_timestamp(lit(s))
  /** Exact per-row cents of extendedprice * (1 - discount). */
  private val volCents: Column =
    expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")

  /** TPC-H Q7 shape (volume shipping): bilateral trade volume
    * between two nations by ship year. lineitem⋈orders shuffles on
    * orderkey; customer/supplier/nation are broadcast. The
    * nation-pair disjunction is pushed into the joined frame before
    * the groupBy, so only qualifying rows reach the shuffle.
    */
  def q7Volume(spark: SparkSession, dir: String,
               natA: Int = 1, natB: Int = 2): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), volCents.as("cents"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select(col("c_custkey"),
      col("c_nationkey").cast("long").as("cust_nat"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"),
      col("s_nationkey").cast("long").as("supp_nat"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nat") === natA && col("cust_nat") === natB) ||
              (col("supp_nat") === natB && col("cust_nat") === natA))
      .groupBy("supp_nat", "cust_nat", "l_year")
      .agg(sum("cents").as("volume_cents"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8 shape (national market share): share of one supplier
    * nation in a region's PROMO-part import volume, by order year.
    * Share is floor(1e4 * nation_cents / total_cents) — exact longs.
    */
  def q8Share(spark: SparkSession, dir: String, targetNat: Int = 7,
              region: String = "ASIA", pType: String = "PROMO"): DataFrame = {
    val nat = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val parts = Tables.part(spark, dir).filter(col("p_type") === pType).select("p_partkey")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), volCents.as("cents"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("s_nationkey") === targetNat, col("cents")).otherwise(lit(0L))).as("nation_cents"),
        sum("cents").as("total_cents"))
      .withColumn("share_e4", expr("(10000 * nation_cents) div nullif(total_cents, 0)"))
  }

  /** TPC-H Q10 shape (returned-item reporting): top customers by
    * revenue on returned lineitems for one order quarter. The
    * returnflag + date filters reach the parquet scans; the report
    * join to customer/nation is broadcast; top-k is a single
    * TakeOrderedAndProject.
    */
  def q10Returns(spark: SparkSession, dir: String, limit: Int = 20): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-10-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), volCents.as("cents"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("cents").as("revenue_cents"))
    rev.join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("c_nat"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acctbal_cents"),
        col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(limit)
  }

  /** TPC-H Q13 shape (customer order distribution): per-customer
    * order counts through a LEFT OUTER join (zero-order customers
    * count), then the distribution of those counts. Two small
    * aggregations; the outer join shuffles on custkey once.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q14 shape (promotion effect): PROMO-part share of one
    * month's revenue — floor(1e4 * promo / total) over exact cents.
    * part is broadcast; one map-combinable aggregate, one row out.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00") &&
              col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .select(col("l_partkey"), volCents.as("cents"))
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("cents")).otherwise(lit(0L))).as("promo_cents"),
        sum("cents").as("total_cents"))
      .withColumn("promo_share_e4", expr("(10000 * promo_cents) div nullif(total_cents, 0)"))
  }

  /** TPC-H Q17 shape (small-quantity revenue): lineitems of one
    * brand's parts whose quantity is below half the part's average
    * quantity. The per-part average is a map-combinable pre-agg over
    * the SAME brand-filtered scan, joined back broadcast (bounded by
    * the brand's part count). The filter is the exact integer
    * cross-multiplication 2*qty*cnt < sum (quantities are integral).
    */
  def q17SmallQty(spark: SparkSession, dir: String, brand: String = "Brand#11"): DataFrame = {
    val parts = Tables.part(spark, dir).filter(col("p_brand") === brand).select("p_partkey")
    // the brand-filtered fact subtree feeds BOTH the per-part
    // average and the final probe — lazy-checkpoint so the
    // lineitem scan + broadcast join run once (file-wide convention
    // for twice-consumed subtrees)
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_cents"))
      .localCheckpoint(eager = false)
    val avgQ = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
      .filter(col("qty") * col("cnt") * 2 < col("sum_qty"))
      .agg(sum("price_cents").as("sum_price_cents"), count(lit(1)).as("n_rows"))
      .withColumn("avg_yearly_cents", expr("sum_price_cents div 7"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    * three OR'd brand/size/quantity bands — the classic test that a
    * disjunction over join + scan columns still prunes (part filter
    * pushed to the part scan as an OR of brands; the residual band
    * predicate evaluated post-join without a re-scan).
    */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#3", "Brand#14", "Brand#21"))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), expr("CAST(l_quantity AS BIGINT)").as("qty"), volCents.as("cents"))
    val band =
      (col("p_brand") === "Brand#3"  && col("p_size").between(1, 15) && col("qty").between(1, 11)) ||
      (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) && col("qty").between(10, 25)) ||
      (col("p_brand") === "Brand#21" && col("p_size").between(1, 35) && col("qty").between(20, 40))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(band)
      .agg(sum("cents").as("revenue_cents"), count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q22 shape (global-relation anti-join): customers whose
    * balance beats the positive-balance average AND who have gone
    * dormant (no orders since the cutoff — every customer in this
    * data has SOME order, so the classic no-orders-ever predicate
    * would be vacuous), grouped by nation. The global (sum, count)
    * pair is a 1-row broadcast cross; the comparison is the exact
    * integer cross-multiplication cents*cnt > sum_cents; the
    * dormancy predicate is a LEFT ANTI join shuffling only the
    * date-pruned custkeys.
    */
  def q22Global(spark: SparkSession, dir: String,
                cutoff: String = "2000-01-01 00:00:00"): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nat"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val thresh = cust.filter(col("bal_cents") > 0)
      .agg(sum("bal_cents").as("sum_cents"), count(lit(1)).as("n_pos"))
    val ordKeys = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts(cutoff)).select(col("o_custkey"))
    cust.crossJoin(broadcast(thresh))
      .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nat")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("total_cents"))
  }

  /** Year-over-year growth per order priority — the lag-over-yearly-
    * aggregate window every BI layer ships. Growth can be NEGATIVE,
    * and truncating integer division disagrees with floor division
    * on negative numerators across engines, so the e4 growth uses
    * the positive-mod floor identity ((n − posmod(n, d)) / d, exact
    * in both engines for any sign of n). First year per priority
    * reports NULLs (no predecessor).
    */
  def qYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val y = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy("yr")
    y.withColumn("prev_cents", lag("cents", 1).over(w))
      .withColumn("growth_e4", expr(
        """CASE WHEN prev_cents IS NULL OR prev_cents <= 0 THEN NULL
          |     ELSE (10000 * (cents - prev_cents)
          |           - (((10000 * (cents - prev_cents)) % prev_cents + prev_cents) % prev_cents))
          |          div prev_cents END""".stripMargin))
  }

  /** TPC-H Q9 shape re-expressed without partsupp (gross margin by
    * supplier nation and ship year): amount = revenue minus a retail
    * cost basis p_retailprice * qty / 10, all in exact cents. The
    * fact join shuffles on orderkey-free keys only (part + supplier
    * broadcast), so the plan is scan → broadcast joins → one small
    * groupBy.
    */
  def q9Margin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("retail_cents"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("supp_nat"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"), volCents.as("rev_cents"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .withColumn("amount_cents",
        col("rev_cents") - expr("(retail_cents * qty) div 10"))
      .groupBy("supp_nat", "l_year")
      .agg(sum("amount_cents").as("margin_cents"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q15 shape (top supplier): the supplier(s) whose revenue
    * over one ship-date quarter equals the maximum — the classic
    * aggregate-then-argmax-by-scalar pattern. The per-supplier
    * aggregate is one map-combinable pass over the date-pruned scan;
    * the max is a 1-ROW broadcast joined back by equality (never a
    * global sort or a window over all suppliers); the name lookup
    * broadcasts the supplier dim. Exact cents; ties all surface,
    * like the spec's view formulation.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .select(col("l_suppkey"), volCents.as("cents"))
      .groupBy("l_suppkey")
      .agg(sum("cents").as("total_cents"))
    val mx = rev.agg(max("total_cents").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_cents") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("total_cents"))
  }

  /** TPC-H Q4 shape (order priority checking, re-keyed to the
    * available columns): orders of one quarter with at least one
    * RETURNED lineitem, counted by priority. The EXISTS is a
    * fact-fact LEFT SEMI on orderkey — the semi build side carries
    * only the returned lineitems' keys (returnflag pushed to the
    * scan) and dedups during the join, so the probe never fans out
    * per matching lineitem. One orderkey shuffle, then a tiny
    * priority groupBy.
    */
  def q4Exists(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
              col("o_orderdate") < ts("1996-10-01 00:00:00"))
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q12 shape (shipping-delay priority audit — shipmode
    * re-keyed to returnflag, commit/receipt lateness re-keyed to
    * ship-vs-order delay since the synthetic drop has neither
    * commitdate nor shipmode): among DELAYED lines (> `lateDays`
    * from order to ship), how many belong to high- vs low-priority
    * orders, per class. One lineitem⋈orders shuffle on orderkey with
    * the delay predicate applied pre-groupBy, then conditional
    * counts over ≤|returnflag| rows — Q12's exact shape.
    */
  def q12Priority(spark: SparkSession, dir: String, lateDays: Int = 750): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays)
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total
    * quantity exceeds `minQty`, with their customer. The HAVING
    * subquery is a map-combinable per-orderkey sum (exact BIGINT —
    * quantities are integral) that shrinks the fact to the few
    * qualifying keys BEFORE any join; orders joins those keys on the
    * already-partitioned axis and customer broadcasts. No window, no
    * fact-sized join input — Q18's point at 100 TB.
    */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Long = 250): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_orderkey")
      .agg(sum("q").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    qty.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("o_orderkey").cast("long").as("o_orderkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"),
        col("sum_qty"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): in
    * finished ('F') multi-supplier orders, count per supplier the
    * orders where it was the ONLY late shipper (late re-keyed to
    * ship-vs-order delay > `lateDays`). The double-correlated
    * EXISTS / NOT EXISTS renders as a LEFT SEMI then LEFT ANTI
    * self-join of the per-(order, supplier) lateness table on the
    * ORDER axis — after the one lineitem⋈orders shuffle, every join
    * is co-partitioned on orderkey, and supplier broadcasts for the
    * final name lookup. Q21 is the classic worst-case join shape;
    * this is its shuffle-minimal Spark rendering.
    */
  def q21Waiting(spark: SparkSession, dir: String, lateDays: Int = 1200): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(expr("bool_or(datediff(l_shipdate, o_orderdate) > " + lateDays + ")").as("late"))
    val cand = pairs.filter(col("late")).select("ok", "sk")
    val others = pairs.select(col("ok").as("o_ok"), col("sk").as("o_sk"))
    val lateOthers = pairs.filter(col("late"))
      .select(col("ok").as("lo_ok"), col("sk").as("lo_sk"))
    val sole = cand
      .join(others, col("ok") === col("o_ok") && col("sk") =!= col("o_sk"), "left_semi")
      .join(lateOthers,
        col("ok") === col("lo_ok") && col("sk") =!= col("lo_sk"), "left_anti")
    sole.join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("sk") === col("s_suppkey"))
      .groupBy(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** Derived partsupp: the testdata drop ships no partsupp table, so
    * the four remaining classic TPC-H shapes (Q2/Q11/Q16/Q20) run
    * over a DETERMINISTIC derivation shared verbatim with the DuckDB
    * oracles. Each part gets 4 distinct suppliers by a stride-mod
    * assignment over the supplier count: stride = S div 4, so the
    * four offsets {0, q, 2q, 3q} satisfy 3q ≤ 3S/4 < S — distinct
    * integers below S, hence distinct mod S for EVERY supplier count
    * ≥ 4, no special-case values (the earlier q+1 stride wrapped at
    * e.g. S = 12, aliasing i = 0 and i = 3 — caught by review, and
    * an assert_true guards the S ≥ 4 floor rather than silently
    * collapsing keys). availqty is a small key hash in [1, 25]
    * (sized so Q20's half-of-shipped gate actually bites), and
    * supplycost is 50-100% of the part's retail price in exact
    * cents. All operands are nonnegative integers, so every value
    * replays bit-exactly cross-engine; the supplier count enters as
    * a 1-row broadcast (never a driver-side collect), keeping the
    * derivation one lazy plan. Scale: |partsupp| = 4·|part| — a
    * dimension-sized frame that broadcasts in the probe-side joins
    * below exactly as a real partsupp dimension would.
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir).agg(count(lit(1)).as("cnt"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"))
      .crossJoin(broadcast(s))
      .select(col("p_partkey"), col("p_retailprice"), col("cnt"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      // assert_true is folded INTO the consumed column (its NULL
      // result coalesced away) so column pruning cannot drop the
      // guard; it throws before any aliased suppkey could be emitted
      .withColumn("cnt", coalesce(
        expr("assert_true(cnt >= 4, 'derived partsupp needs >= 4 suppliers')")
          .cast("long"),
        col("cnt")))
      .withColumn("ps_suppkey", expr("(p_partkey * 7 + i * (cnt div 4)) % cnt"))
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        expr("1 + (p_partkey * 37 + ps_suppkey * 11) % 25").as("ps_availqty"),
        expr("(CAST(round(p_retailprice * 100) AS BIGINT) * (50 + (p_partkey * 13 + i * 29) % 51)) div 100")
          .as("ps_cost_cents"))
  }

  /** TPC-H Q2 shape (minimum-cost supplier): for each part of one
    * type/size band, the region's supplier(s) offering it at the
    * minimum supplycost. The correlated MIN subquery renders as a
    * per-part min over the region-filtered partsupp joined back by
    * (partkey, cost) equality — the aggregate side is bounded by the
    * FILTERED part dim (Q2's predicate is highly selective by
    * construction), so both it and the dims broadcast; ties all
    * surface, like the spec. The shared join frame feeds the min agg
    * and the probe, so it is lazy-checkpointed (file-wide
    * twice-consumed-subtree convention).
    */
  def q2MinCost(spark: SparkSession, dir: String, region: String = "EUROPE",
                pType: String = "STANDARD", maxSize: Int = 25): DataFrame = {
    val natR = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val rs = Tables.supplier(spark, dir)
      .join(broadcast(natR), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"),
        expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("bal_cents"), col("n_name"))
    val pp = Tables.part(spark, dir)
      .filter(col("p_type") === pType && col("p_size") <= maxSize)
      .select("p_partkey", "p_brand")
    val j = partsupp(spark, dir)
      .join(broadcast(pp), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(rs), col("ps_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("ps_cost_cents"), col("bal_cents"))
      .localCheckpoint(eager = false)
    val m = j.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min("ps_cost_cents").as("mc"))
    j.join(broadcast(m),
        col("p_partkey") === col("m_partkey") && col("ps_cost_cents") === col("mc"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("ps_cost_cents").as("cost_cents"), col("bal_cents"))
  }

  /** TPC-H Q11 shape (important stock): per-part inventory value
    * (availqty · supplycost, exact cents) held by one region's
    * suppliers, reporting parts whose value exceeds twice the MEAN
    * per-part value. The spec's value > fraction·total threshold is
    * made scale-free (value·n_parts > 2·total — the same 1-row
    * broadcast cross-multiplication, but selective at every SF
    * instead of only at the spec's fixed fraction). One partkey
    * groupBy; the global (total, count) pair broadcasts.
    */
  def q11StockValue(spark: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val natR = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val rs = Tables.supplier(spark, dir)
      .join(broadcast(natR), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = partsupp(spark, dir)
      .join(broadcast(rs), col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_availqty") * col("ps_cost_cents")).as("value_cents"))
    val t = v.agg(sum("value_cents").as("total_cents"), count(lit(1)).as("n_parts"))
    v.crossJoin(broadcast(t))
      .filter(col("value_cents") * col("n_parts") > col("total_cents") * 2)
      .select("ps_partkey", "value_cents")
  }

  /** TPC-H Q16 shape (parts/supplier relationship): how many
    * distinct suppliers can provide each (brand, type, size) cell,
    * excluding one brand/type and suppliers flagged delinquent
    * (negative balance — the complaints-comment analog; the drop has
    * no comment column). part broadcasts into the partsupp probe,
    * the exclusion is a broadcast LEFT ANTI, and the distinct count
    * groups on the small (brand, type, size) axis.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String,
                     excludeBrand: String = "Brand#5",
                     excludeType: String = "PROMO"): DataFrame = {
    val pp = Tables.part(spark, dir)
      .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    partsupp(spark, dir)
      .join(broadcast(pp), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 shape (potential part promotion): one region's
    * suppliers holding surplus stock (availqty > half the quantity
    * they shipped of that part over the window) of one name-prefix
    * part family. The nested correlated-sum semi renders as: the
    * name-semi-pruned, date-pruned lineitem aggregates per
    * (partkey, suppkey) — map-combinable exact BIGINT — then joins
    * the partsupp frame on BOTH keys (pairs with no shipments drop,
    * matching the spec's NULL-sum exclusion), the surplus gate is
    * the cross-multiplied 2·availqty > sum_qty, and the surviving
    * supplier keys distinct before the broadcast name/nation lookup.
    */
  def q20PromoParts(spark: SparkSession, dir: String, namePrefix: String = "small",
                    region: String = "EUROPE"): DataFrame = {
    val pk = Tables.part(spark, dir)
      .filter(col("p_name").startsWith(namePrefix)).select(col("p_partkey"))
    val sh = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1995-01-01 00:00:00") &&
              col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
    val natR = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val rs = Tables.supplier(spark, dir)
      .join(broadcast(natR), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    partsupp(spark, dir)
      .join(sh, col("ps_partkey") === col("l_partkey") &&
                col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") * 2 > col("sum_qty"))
      .select("ps_suppkey").distinct()
      .join(broadcast(rs), col("ps_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }
}
