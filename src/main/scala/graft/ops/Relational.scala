package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational demo queries over the TPC-H-ish star schema.
  *
  * Numeric discipline for oracle parity (SURVEY §7.4 #4): monetary doubles are
  * cast to DECIMAL(18,2) *before* aggregation — decimal sums are exact and
  * therefore independent of partitioning / aggregation order, so results match
  * DuckDB bit-for-bit at any parallelism — then cast back to DOUBLE on output
  * so the output schema is engine-neutral.
  *
  * Scale notes: all aggregations are partial (map-side combine) by
  * construction; dimension tables (region/nation/customer at these row counts)
  * are broadcast so fact-side rows never shuffle for the join.
  */
object Relational {

  /** Exact-money helper: double -> DECIMAL(18,2). */
  def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Per-line discounted revenue as an exact scale-4 decimal —
    * cents × (1 − disc), the shared money primitive of the TPC-H family
    * (sum first, scale to basis points, cast long LAST: the
    * basis-points-after-sum discipline).
    */
  def discountedLine: Column =
    money(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - money(col("l_discount")))

  /** One region's nations as a broadcastable (n_nationkey, n_name) slice —
    * the shared prune-before-the-facts prefix of Q5/Q8.
    */
  private def regionNations(spark: SparkSession, sfDir: String, region: String): DataFrame =
    Tables.load(spark, sfDir, "nation")
      .join(broadcast(Tables.load(spark, sfDir, "region")
          .filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))

  /** TPC-H Q1-style pricing summary (hash agg; exercises partial agg +
    * whole-stage codegen; cf. reference gap SURVEY §2B "aggregations: none").
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** Star join: revenue per nation in one region and date window.
    * lineitem (fact) joins orders on the shuffle path; customer/nation/region
    * dims are broadcast — at 100 TB only the two fact tables shuffle, on their
    * join key.
    */
  def starJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Top-k per group via row_number with a deterministic tie-break
    * (SURVEY §7.4 #5): top 3 customers by order spend per nation.
    */
  def topCustomersPerNation(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val spend = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_spend"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
    spend.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("total_spend"), col("rk").cast("long").as("rk"))
  }

  /** ROLLUP grouping-sets aggregation (subtotals + grand total). */
  def rollupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  /** CUBE grouping sets: all 4 grouping combinations in one pass — Spark
    * expands to grouping sets and still aggregates partially before the one
    * shuffle (same scale shape as plain groupBy, x4 grouping-set rows).
    */
  def cubeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.cube(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
  }

  /** Anti-join: customers with no orders since 2000 (reference has no joins
    * beyond the point lookup E1; semi/anti come free with Catalyst — SURVEY
    * §2B).
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Semi-join (EXISTS): customers WITH at least one order in the window —
    * the anti-join's dual. A semi join shuffles only the join keys of the
    * probe side and short-circuits on first match: at 100 TB it is strictly
    * cheaper than the inner-join-then-distinct a naive EXISTS rewrite plans.
    */
  def customersWithOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** PIVOT: daily event counts reshaped wide, one column per event type.
    * The value list is EXPLICIT — with it Spark plans a single partial-agg
    * pass (each combination an aggregate column); without it Spark first runs
    * a distinct scan to discover values, a second job a 100 TB pipeline
    * shouldn't pay. Count cells for absent combinations are null in Spark's
    * pivot and 0 in conditional-aggregation engines — coalesced to 0 so the
    * output is engine-neutral.
    */
  def pivotDailyTypes(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val types = Seq("click", "error", "purchase", "signup", "view")
    ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Fixed-width histogram of document lengths: bucket = floor(len/50).
    * In-row bucketing + one partial agg — the scan-shaped profile pass a
    * curation pipeline runs before choosing filter thresholds. Integer
    * lengths keep the double division exact in any engine.
    */
  def docLengthHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs.groupBy(floor(length(col("text")) / lit(50)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
           min(length(col("text"))).cast("long").as("min_len"),
           max(length(col("text"))).cast("long").as("max_len"))
  }

  /** Scalar-subquery filter: parts priced above the corpus mean. The mean
    * rides as a ONE-ROW broadcast (BroadcastNestedLoopJoin over a single
    * aggregated row — no shuffle of the probe side, no driver collect), the
    * comparison is integer-cents math end to end: sum(cents) DIV count is
    * exact in any engine, so the predicate boundary is hash-stable where a
    * floating-point mean never is.
    */
  def partsAboveMeanPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .withColumn("cents", (money(col("p_retailprice")) * 100).cast("long"))
    val thr = part.agg(expr("sum(cents) DIV count(1)").as("thr_cents"))
    part.join(broadcast(thr))
      .filter(col("cents") > col("thr_cents"))
      .select(col("p_partkey"), col("p_retailprice"))
  }

  /** TPC-H Q13-style distribution: how many customers placed k orders, for
    * each k — the canonical left-outer-join + double aggregation. The outer
    * join preserves order-less customers (k = 0); both aggs are partial
    * before their single shuffle each.
    */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Per-user ordered window functions over the event log: row_number + lag —
    * the same per-key window machinery that reconstructs RawEvent.previous.
    */
  def eventWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      col("event_id"), col("user_id"), col("event_type"),
      row_number().over(w).cast("long").as("rn"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
  }

  /** Gap-based sessionization: a new session starts after `gapSeconds` of
    * per-user inactivity. Classic lag + cumulative-sum-of-boundaries — two
    * window passes over ONE shuffle (same partitioning), then a hash agg.
    * Integer epoch-second math for oracle parity.
    */
  def sessionize(spark: SparkSession, sfDir: String, gapSeconds: Long = 1800): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val newSession = when(prevTs.isNull ||
      (unix_timestamp(col("ts")) - unix_timestamp(prevTs)) > gapSeconds, 1L).otherwise(0L)
    ev.withColumn("session_idx",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"))
  }

  /** Tumbling-window aggregation in batch form: hourly counts per event type
    * (streaming-window semantics; SURVEY §2B "streaming windows: none in
    * reference").
    */
  def hourlyEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(money(col("value"))).cast("double").as("sum_value"))
  }

  /** Range (interval) join via time-bucket binning: count the events falling
    * in each order's 7-day window. A naive `t1.key = t2.key AND t2.ts BETWEEN
    * lo AND hi` join gives Spark only a non-equi condition to work with —
    * at best a shuffled nested loop. Binning both sides to window-width
    * buckets turns it into an EQUI-join on (key, bucket) + a residual range
    * filter: each order probes exactly the 2 buckets its window can span, each
    * event lands in 1 bucket, so the join is a plain shuffle hash/merge join
    * that scales like any other equi-join (PlanSpec asserts no nested loop).
    */
  def rangeJoinBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 7L * 86400L // bucket width == window length => 2 candidate buckets
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("bucket", floor(unix_timestamp(col("ts")) / W))
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("b0", floor(unix_timestamp(col("o_orderdate")) / W))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
    o.join(ev,
        ev("user_id") === col("o_custkey") && ev("bucket") === o("bucket") &&
        ev("ts") >= col("o_orderdate") &&
        ev("ts") < col("o_orderdate") + expr("INTERVAL 7 DAYS"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("event_id")).as("n_events"))
  }

  /** Funnel conversion: per user, did a signup precede a purchase? The
    * ordered-sequence question every product pipeline asks of an event log.
    * No window needed — "some signup before some purchase" reduces to
    * min(signup ts) < max(purchase ts), two conditional aggregates in ONE
    * partial-agg pass (each map partition ships 2 timestamps + 2 counts per
    * user, never the event history). Tie-break: a purchase at exactly the
    * signup instant does not count as converted (strict <).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "signup", 1)).as("n_signups"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      .withColumn("converted",
        col("first_signup").isNotNull && col("last_purchase").isNotNull &&
          col("first_signup") < col("last_purchase"))
  }

  /** Cohort retention: users grouped by first-activity day (their cohort),
    * counted on each subsequent active day offset — the day-N retention
    * triangle. Three keyed stages, all on bounded intermediates: distinct
    * (user, day) activity (partial agg), per-user cohort day (partial agg),
    * an equi-join on user, then the final (cohort, offset) count — shuffle
    * rows never exceed distinct user-days. Integer date arithmetic end to
    * end, so the offsets are engine-exact.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    // note: no exchange-reuse alignment needed here (cf. dauWau /
    // soleProblemSuppliers) — Catalyst collapses the redundant
    // distinct-before-min on the cohort branch into ONE direct aggregation
    // over the scan, which ships a single (user, min) pair per map partition:
    // strictly cheaper than materializing and reusing the wider distinct
    val activity = ev.distinct()
    val cohorts = activity.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** UNPIVOT (melt): wide per-segment metrics reshaped long, one row per
    * (segment, metric). The inverse of pivot; Spark plans it as an in-row
    * `Expand` (each input row emits one row per value column) — no shuffle
    * beyond the upstream agg, so at 100 TB it costs exactly the k× row fan-out
    * and nothing else. Metrics are all BIGINT (counts + exact cents) so the
    * long `value` column needs no lossy cast.
    */
  def unpivotSegmentMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val wide = c.groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum((money(col("c_acctbal")) * 100).cast("long")).as("acctbal_cents"),
        countDistinct(col("c_nationkey")).as("n_nations"))
    wide.unpivot(
      ids = Array(col("c_mktsegment")),
      values = Array(col("n_customers"), col("acctbal_cents"), col("n_nations")),
      variableColumnName = "metric",
      valueColumnName = "value")
  }

  /** GROUPING SETS beyond what rollup/cube can express: two independent
    * one-dimension aggregates — (returnflag) and (linestatus) — computed in a
    * SINGLE pass over the fact table (one Expand + one partial agg + one
    * shuffle) instead of two scans unioned. The explicit grouping-bit mask
    * disambiguates "NULL because not grouped" from a null data value, the
    * standard grouping-sets pitfall.
    */
  def groupingSetsCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
           // grouping() is an aggregate-context marker: it must be computed
           // inside THIS agg, not a downstream projection
           (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
             .cast("long").as("gmask"))
  }

  /** Ranking-function suite over one window: ntile quartiles, percent_rank,
    * cume_dist, dense_rank — per-segment account-balance distribution. One
    * shuffle on the partition key; the full ordering includes the unique
    * custkey tie-break (SURVEY §7.4 #5) so every rank is deterministic and
    * the rank-ratio doubles are identical IEEE divisions in any engine.
    */
  def rankSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    c.select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cdist"),
      dense_rank().over(w).cast("long").as("drank"))
  }

  /** Time-series gap fill: per-user DAILY event counts with missing days
    * zero-filled across each user's own [first, last] activity span. The
    * calendar is generated distributed — `sequence()` + explode per user row,
    * never a driver-side loop or a global calendar cross join — so the row
    * fan-out is bounded by sum over users of span-days, and the final join is
    * a plain equi-join on (user, day). The standard resample/densify step
    * before any per-entity time-series model.
    */
  def gapFillDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val counts = ev.groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans.select(
      col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
    calendar.join(counts, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Forward fill (last observation carried forward): nulls are synthesized
    * deterministically on the measure (every third event loses its value) and
    * repaired with `last(..., ignoreNulls)` over the per-user ordered window.
    * One shuffle on the entity key; the running frame is streaming-friendly
    * (UNBOUNDED PRECEDING .. CURRENT ROW, no re-scan per row). The imputation
    * primitive for sensor/metric tables.
    */
  def forwardFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val sparse = when(col("event_id") % 3 === 0, lit(null).cast("double"))
      .otherwise(col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(
      col("event_id"), col("user_id"), sparse.as("sparse_value"),
      last(sparse, ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Correlated-subquery decorrelation, TPC-H Q17 shape: revenue from
    * line items whose quantity is below 20 % of their part's average — the
    * canonical `WHERE l_quantity < (SELECT 0.2*avg(..) WHERE p_partkey =
    * l_partkey)` query. A per-row correlated subquery would be an O(n)
    * re-scan per line item; the decorrelated plan (what Catalyst's
    * RewriteCorrelatedScalarSubquery produces for the SQL form, written
    * explicitly here) aggregates per part ONCE and equi-joins back: the
    * per-part agg is partial (map-side combine shrinks it to one row per
    * part per partition) and both join sides shuffle on the same key.
    * The 20 %-of-mean predicate is exact integer math — `qty_cents * 5 * n <
    * sum_cents` is `qty < 0.2 * avg` with no floating-point boundary — so
    * the survivor set is hash-stable in any engine.
    */
  def smallQuantityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .withColumn("qty_c", (money(col("l_quantity")) * 100).cast("long"))
    val part = Tables.load(spark, sfDir, "part").select(col("p_partkey"), col("p_brand"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty_c")).as("sum_qc"), count(lit(1)).as("n_li"))
    li.join(perPart, "l_partkey")
      .filter(col("qty_c") * 5 * col("n_li") < col("sum_qc"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(money(col("l_extendedprice"))).cast("double").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  /** Sliding-frame window aggregation — the moving-average/rolling-sum family
    * missing from the rank/lag suite: a trailing ROWS frame (last 7 events)
    * and a trailing RANGE frame (last hour by event time) over one per-user
    * ordered window. Both frames are streaming-friendly (bounded trailing
    * state, no re-scan per row) and share ONE shuffle on the entity key.
    * Integer-cents math throughout: the moving average is `sum div count` —
    * exact at any magnitude, no float accumulation order to drift across
    * engines. The RANGE frame orders by floored epoch seconds, so frame
    * membership includes all peer rows of a second regardless of tie order —
    * deterministic by construction.
    */
  def movingAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("cents", (money(col("value")) * 100).cast("long"))
      .withColumn("sec", unix_timestamp(col("ts")))
    val wRows = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    val wRange = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-3600, 0)
    ev.select(
        col("event_id"), col("user_id"),
        sum(col("cents")).over(wRows).as("mov_sum_cents"),
        count(lit(1)).over(wRows).cast("long").as("n_frame"),
        count(lit(1)).over(wRange).cast("long").as("n_last_hour"))
      .withColumn("mov_avg_cents", expr("mov_sum_cents div n_frame"))
  }

  /** Strict-order window funnel (the k-step generalization of [[funnel]],
    * ClickHouse `windowFunnel` semantics): per user, the deepest prefix of
    * signup → click → purchase reached by STRICTLY time-increasing events
    * that ALL land within `window` of the first step; output = users per
    * funnel depth. [[funnel]]'s min/max trick answers the 2-step ordering
    * question without any per-user history; with 3+ ordered steps the chain
    * ("earliest click AFTER the earliest signup, earliest purchase after
    * THAT, all within the horizon") needs the per-user event sequence.
    *
    * Shape: ONE shuffle on the user key. Funnel-irrelevant events are nulled
    * BEFORE the aggregation (`collect_list` skips nulls), so only funnel-step
    * (ts, type) tuples ever cross the wire — per-user state is bounded by the
    * user's funnel-event count, not their history. The chain itself is a
    * greedy in-row fold (`aggregate` over the sorted sequence): greedy =
    * minimal at every step, so it computes exactly the nested-MIN chain the
    * oracle states declaratively. An equivalent k-level nested-aggregation
    * join tree costs k shuffles; this costs one.
    */
  def windowFunnel(spark: SparkSession, sfDir: String): DataFrame =
    windowFunnelDf(Tables.load(spark, sfDir, "events"))

  /** DataFrame-level core of [[windowFunnel]] (events need `user_id`, `ts`,
    * `event_id`, `event_type`); `PropertySpec` drives it over generated
    * sequences against a reference fold.
    */
  def windowFunnelDf(ev: DataFrame): DataFrame = {
    val steps = Seq("signup", "click", "purchase")
    val horizon = expr("INTERVAL 1 DAY")
    val item = when(col("event_type").isin(steps: _*),
      struct(col("ts"), col("event_id"), col("event_type")))
    val nullT = lit(null).cast("timestamp")
    val folded = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(item)).as("seq"))
      .withColumn("acc", aggregate(
        col("seq"),
        struct(nullT.as("t1"), nullT.as("t2"), nullT.as("t3")),
        (acc, e) => {
          // deadline: every later step must land within `horizon` of t1
          val inWindow = e.getField("ts") <= acc.getField("t1") + horizon
          struct(
            when(acc.getField("t1").isNull && e.getField("event_type") === "signup",
              e.getField("ts")).otherwise(acc.getField("t1")).as("t1"),
            when(acc.getField("t2").isNull && acc.getField("t1").isNotNull &&
                 e.getField("event_type") === "click" &&
                 e.getField("ts") > acc.getField("t1") && inWindow,
              e.getField("ts")).otherwise(acc.getField("t2")).as("t2"),
            when(acc.getField("t3").isNull && acc.getField("t2").isNotNull &&
                 e.getField("event_type") === "purchase" &&
                 e.getField("ts") > acc.getField("t2") && inWindow,
              e.getField("ts")).otherwise(acc.getField("t3")).as("t3"))
        }))
    folded.select(
        when(col("acc.t3").isNotNull, 3L)
          .when(col("acc.t2").isNotNull, 2L)
          .when(col("acc.t1").isNotNull, 1L)
          .otherwise(0L).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
  }

  /** Robust outlier detection via median absolute deviation (MAD): per
    * event type, median, MAD, and the count of values beyond 3 MADs — the
    * standard robust alternative to mean/stddev z-scores (a single extreme
    * value drags a mean arbitrarily; the median moves by at most one rank).
    *
    * Shape: medians need ranks, so this is inherently two aggregation passes
    * (median first, then the deviation median) plus a counting pass — but
    * the per-group stats are GROUP-CARDINALITY rows (5 here; bounded at any
    * corpus size), so they ride back onto the fact as broadcasts and the
    * fact itself is only ever scanned narrow (2 columns) and partial-agg'd.
    * The single-pass escape at extreme scale is an approximate-percentile
    * sketch; this operator keeps the EXACT percentile (mergeable buffers,
    * dyadic 0.5 fraction over integer cents => bit-exact in any engine —
    * same argument as `ops_quantiles`).
    */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), (money(col("value")) * 100).cast("long").as("cents"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val stats = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"),
           expr("percentile(abs(cents - med), 0.5)").as("mad"),
           count(lit(1)).as("n"))
    ev.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"), max(col("n")).as("n"),
           sum(when(abs(col("cents") - col("med")) > col("mad") * 3, 1L).otherwise(0L))
             .as("n_outliers"))
  }

  /** TPC-H Q15 shape — argmax over an aggregate: the supplier(s) achieving
    * MAXIMUM quarterly revenue. The correlated form ("revenue = (SELECT
    * MAX(revenue) FROM view)") decorrelates to the same one-row-broadcast
    * scalar pattern as `ops_scalar_subquery`, but over an AGGREGATE instead
    * of a scan: per-supplier revenue reduces once (partial agg), its max
    * rides back as one broadcast row, ties all emit (Q15 semantics — no
    * arbitrary tie cut). Revenue in basis points (×10000): the 4-decimal
    * discount product becomes integer-exact, so no decimal→int cast rounding
    * can diverge between engines.
    */
  def topRevenueSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val s = Tables.load(spark, sfDir, "supplier")
    val rev = li.groupBy(col("l_suppkey"))
      .agg((sum(money(col("l_extendedprice")) *
             (lit(1).cast("decimal(18,2)") - money(col("l_discount")))) * 10000)
        .cast("long").as("rev_bp"))
    val mx = rev.agg(max(col("rev_bp")).as("max_bp"))
    rev.join(broadcast(mx)).filter(col("rev_bp") === col("max_bp"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_bp"))
  }

  /** TPC-H Q18 shape — large-quantity orders: HAVING over a per-order
    * aggregate joined back to its dimensions. The per-order quantity sum
    * reduces the fact FIRST (partial agg; the filter then keeps ~2% of
    * orders), and only the surviving keys join orders and the broadcast
    * customer dim — never fact × dim before the reduction. Top-100 by
    * quantity is TakeOrderedAndProject with the order key as tie-break.
    */
  def largeQuantityOrders(spark: SparkSession, sfDir: String,
                          minQtyCents: Long = 15000L): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val oq = li.groupBy(col("l_orderkey"))
      .agg((sum(money(col("l_quantity"))) * 100).cast("long").as("qty_c"))
      .filter(col("qty_c") > minQtyCents)
    oq.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("qty_c"))
      .orderBy(col("qty_c").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Share-of-total report (ratio_to_report): each nation's revenue as a
    * permille share of its REGION's total. The window-over-aggregate
    * pattern: the share window partitions an input that is already reduced
    * to group cardinality (nations), so the "extra" window shuffle moves
    * dozens of rows at any corpus size — windows are only a scale trap when
    * they partition fact-sized data. Share is exact integer math
    * (cents × 1000 div region cents), hash-stable in any engine.
    */
  def revenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val perNation = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum((money(col("l_extendedprice")) * 100).cast("long")).as("cents"))
    perNation
      .withColumn("region_cents",
        sum(col("cents")).over(Window.partitionBy(col("r_name"))))
      .select(col("r_name"), col("n_name"), col("cents"),
        expr("cents * 1000 div region_cents").as("share_permille"))
  }

  /** Event-type transition matrix — the sequence-analytics primitive beyond
    * funnels: counts of consecutive (from, to) event-type pairs per user
    * timeline (the empirical Markov transitions of product navigation).
    * One window shuffle on the user key derives each row's successor via
    * `lead()`, then a partial-agg count over the (from, to) grid — transition
    * state never materializes beyond one successor column, and the output is
    * |event types|² rows at any corpus size.
    */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exact DAU / trailing-7-day WAU per day — the canonical product metric
    * pair, and the canonical hard sliding aggregate: windowed COUNT DISTINCT
    * does not decompose (a user active on 5 of the 7 days must count once),
    * so no window frame or partial agg computes it directly.
    *
    * The scalable exact shape: reduce events to distinct (user, day) pairs
    * ONCE, then explode each pair onto the 7 window-END days it covers
    * (in-row, ×7 fan-out of the already-deduplicated pairs — not of raw
    * events) and count distinct covering users per end day. Every stage is a
    * partial-agg'd distinct on (user, day) keys; nothing rescans history per
    * day, and the window length only scales the in-row fan-out. The same
    * shape computes MAU with a ×30 fan-out on day granularity — fan-out =
    * window/granularity, the knob to coarsen at extreme ratios.
    */
  def dauWau(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    // the explicit not-null guard makes BOTH consuming branches carry the
    // same filter, so their distinct subtrees canonicalize identically and
    // AQE's runtime stage reuse computes the pair reduction ONCE
    // (ReusedExchange in the executed plan — pinned in PlanSpec); the
    // dau-side inner join would otherwise infer `isnotnull(day)` only there
    val userDays = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .filter(col("user_id").isNotNull && col("day").isNotNull)
      .distinct()
    val coverage = userDays.select(col("user_id"),
        explode(sequence(col("day"), col("day") + expr("INTERVAL 6 DAYS"),
          expr("INTERVAL 1 DAY"))).as("day"))
      .distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = coverage.groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // report days with activity (coverage extends 6 days past the data edge)
    dau.join(wau, Seq("day")).select(col("day"), col("dau"), col("wau"))
  }

  /** TPC-H Q19 shape — disjunctive multi-table predicate (OR of brand/size/
    * quantity conjunctions): the classic test of whether an engine pushes
    * the per-table projections of a cross-table OR down to the scans rather
    * than evaluating the whole disjunction post-join. Catalyst extracts the
    * part-only disjuncts to the part scan (each OR arm constrains p_brand/
    * p_size, so their union prunes the build side before the broadcast);
    * the quantity arms stay in the join filter where they belong. Revenue
    * in exact cents; one aggregate row out.
    */
  def discountedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part")
    val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
      col("l_quantity").between(20, 30)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(
        (sum(money(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - money(col("l_discount")))) * 10000)
          .cast("long").as("revenue_bp"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q14 shape — conditional-aggregate share (promo revenue fraction
    * in a month): both the conditional and total sums ride ONE partial-agg
    * pass over the joined scan, and the share is exact integer permille —
    * the one-pass CASE-inside-SUM idiom, never two scans or a self-join.
    */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
    val p = Tables.load(spark, sfDir, "part")
    val disc = money(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - money(col("l_discount")))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,2)"))) * 10000)
          .cast("long").as("promo_bp"),
        (sum(disc) * 10000).cast("long").as("total_bp"))
      .select(col("promo_bp"), col("total_bp"),
        expr("promo_bp * 1000 div total_bp").as("promo_permille"))
  }

  /** Running-max drawdown of the daily revenue series — the peak-to-trough
    * metric (finance's max drawdown, ops' regression-from-peak): per day,
    * the running maximum of daily revenue to date and the shortfall from
    * it. The prefix-max window is the one frame shape the inventory's other
    * windows don't cover (sliding avg, rank, prefix-SUM exist). Exact cents
    * end to end. Fact-sized work is the one day-grain partial agg; both
    * windows move day-cardinality rows.
    */
  def maxDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val daily = o.groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum((money(col("o_totalprice")) * 100).cast("long")).as("cents"))
    val runMax = max(col("cents")).over(
      Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow))
    daily
      .withColumn("peak_cents", runMax)
      .withColumn("drawdown_cents", col("peak_cents") - col("cents"))
  }

  /** Benford first-digit audit — the classic fraud/data-quality screen:
    * leading-digit distribution of order totals against Benford's law. The
    * digit extraction stays EXACT: price → cents (decimal→BIGINT, the
    * repo-wide money discipline) → first character of the integer's decimal
    * string — identical in any engine, where floor(x/10^floor(log10 x)) on
    * doubles can flip at powers of ten. Expected frequencies are milli-unit
    * constants (log10(1+1/d) is irrational; the CONSTANTS are the spec).
    * One scan, partial agg onto nine keys; the share window moves nine rows.
    */
  def benfordAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val expected = Map(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L, 5 -> 79L,
      6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
    val o = Tables.load(spark, sfDir, "orders").filter(col("o_totalprice") > 0)
    val digit = substring((money(col("o_totalprice")) * 100).cast("long").cast("string"), 1, 1)
      .cast("long")
    val expectedCol = expected.foldLeft(lit(null).cast("long")) {
      case (acc, (d, p)) => when(col("digit") === d, p).otherwise(acc)
    }
    o.select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
      .withColumn("observed_permille",
        expr("1000 * n_orders div sum(n_orders) OVER ()"))
      .withColumn("expected_permille", expectedCol)
      .withColumn("deviation_permille",
        abs(col("observed_permille") - col("expected_permille")))
  }

  /** TPC-H Q4 shape — EXISTS-with-condition rolled up: order counts per
    * priority among orders with at least one LATE line (shipped > 90 days
    * after the order date; this schema has no commit/receipt dates, so
    * lateness is ship-vs-order-date). The EXISTS decorrelates to a LEFT
    * SEMI join — the probe ships only its join key + grouping column, the
    * build side prunes to late lines at the scan (the date comparison needs
    * both tables, so it sits in the join condition; the 1996 order window
    * DOES push to the orders scan) — and the priority rollup is a partial
    * agg over the handful of surviving keys. Never inner-join-then-distinct.
    */
  def latePriorityCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** TPC-H Q3 shape — shipping-priority top-k: revenue of orders not yet
    * fully shipped at the cutoff, for one market segment, top 10 by
    * revenue. The segment filter broadcasts customer keys onto the orders
    * scan; revenue reduces per order with partial agg (basis-point integer
    * cents so the top-k cut is exact); the final cut is a
    * TakeOrderedAndProject heap with the order key tie-break, never a
    * global sort.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1996-03-15").cast("timestamp")
    val c = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cutoff)
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(money(col("l_extendedprice")) *
             (lit(1).cast("decimal(18,2)") - money(col("l_discount")))) * 10000)
        .cast("long").as("rev_bp"))
      .orderBy(col("rev_bp").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Cumulative distinct users per day — the expanding-window COUNT
    * DISTINCT, which (like [[dauWau]]'s sliding variant) no window frame
    * computes directly: a user active on 50 days must count once, forever.
    * The first-touch decomposition makes it exact AND cheap: distinct-count
    * over an expanding window ≡ running SUM of NEW-user counts, and "new" =
    * the user's MIN activity day — one per-user reduction (partial agg), one
    * day-grain rollup, one running sum over day-cardinality rows. The only
    * window partitions DAYS (thousands of rows at any corpus size); the
    * per-user min is where the data-sized work happens, and it is a plain
    * partial-aggregable min. Days with activity but no new users report
    * their standing total (day census LEFT join, zero-filled).
    */
  def cumulativeUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val newPerDay = firstSeen.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val days = ev.select(col("day")).distinct()
    days.join(newPerDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users",
        sum(col("n_new")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** FULL OUTER reconciliation — the one standard join type the inventory
    * lacked: hourly signup counts vs hourly purchase counts, keeping hours
    * present on EITHER side (zero-filled). The canonical cross-system /
    * cross-stream reconciliation report: inner would silently drop exactly
    * the mismatched hours the report exists to surface. Both sides are
    * partial-agg'd to group cardinality BEFORE the join, so the full outer
    * joins two aggregate-sized inputs — never fact against fact.
    */
  def reconcileHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    def hourly(t: String, name: String): DataFrame =
      ev.filter(col("event_type") === t)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as(name))
    hourly("signup", "n_signups")
      .join(hourly("purchase", "n_purchases"), Seq("hour"), "full_outer")
      .select(col("hour"),
        coalesce(col("n_signups"), lit(0L)).as("n_signups"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
  }

  /** TPC-H Q21 shape — multi-EXISTS/NOT-EXISTS self-correlation, decorrelated:
    * suppliers who were the SOLE supplier with a returned line in orders that
    * involved at least two suppliers ("kept the order waiting"). The naive
    * form is two correlated subqueries against the fact itself (EXISTS another
    * supplier in the order, NOT EXISTS another supplier with a returned line)
    * — two extra fact self-joins. The decorrelated plan pre-aggregates the
    * fact ONCE to (order, supplier) grain with a has-bad-line marker; BOTH
    * downstream needs — the per-order census (distinct-supplier count =
    * plain count at this grain, distinct-bad count = marker sum; no
    * distinct-Expand) and the bad (order, supplier) pairs — derive from that
    * one grouped frame, whose identical exchange subtree physical planning
    * reuses (one fact scan, one fine-grained shuffle). The fact is never
    * self-joined row-to-row. Top-25 by wait count is TakeOrderedAndProject
    * with a unique `s_name` tie-break, so the cut line is deterministic.
    */
  def soleProblemSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val s = Tables.load(spark, sfDir, "supplier")
    // explicit not-null guard: the bad-pairs branch alone would infer
    // isnotnull(l_suppkey) from its supplier join, de-aligning the two
    // consumers' subtrees; with both branches identical, AQE reuses ONE
    // (order, supplier) exchange — one fact scan at runtime
    val grouped = li
      .filter(col("l_orderkey").isNotNull && col("l_suppkey").isNotNull)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_bad"))
    val target = grouped.groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("n_supp"), sum(col("has_bad")).as("n_bad"))
      .filter(col("n_supp") >= 2 && col("n_bad") === 1)
      .select(col("l_orderkey"))
    val badPairs = grouped.filter(col("has_bad") === 1)
      .select(col("l_orderkey"), col("l_suppkey"))
    badPairs.join(target, "l_orderkey")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  /** One-pass data-quality audit (Deequ-style constraint metrics): null rate,
    * value-domain, range, duplicate-key, and referential-integrity violation
    * counts over the orders fact, emitted in long form (check, n_bad).
    *
    * Shape: ALL row-local checks fold into ONE conditional-aggregation pass;
    * the duplicate-key census rides the same pass as `count - countDistinct`;
    * referential integrity is a broadcast LEFT join against the customer key
    * set (dim-sized build side) whose miss-marker folds into the same agg —
    * one fact scan, one shuffle, however many checks. The audited input is
    * the base table plus deterministically planted violations (same
    * synthesized-defect pattern as `cdc_key_inventory`: a `% 101` slice with
    * orphan key / negative price / bad status / out-of-range date, a `% 103`
    * slice with a NULL key), mirrored in the oracle — so every check is
    * proven to fire, not just to return zero.
    */
  def dqAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), lit(1).as("c_present"))
    // planted defects: slice A duplicates existing keys with an orphan
    // custkey, negative price, out-of-domain status, far-future date; slice B
    // nulls the custkey. Both derived from base rows, so the oracle replays
    // the same construction. The orphan key is the NEGATED custkey: real
    // custkeys are positive at every scale factor, so a planted key can
    // never collide with an existing customer (a fixed +10M offset would at
    // SFs where custkeys exceed 10M, silently un-firing the orphan check).
    val badA = base.filter(col("o_orderkey") % 101 === 0).select(
      col("o_orderkey"), (-col("o_custkey")).as("o_custkey"),
      lit("X").as("o_orderstatus"), (-col("o_totalprice")).as("o_totalprice"),
      (col("o_orderdate") + expr("INTERVAL 100 YEARS")).as("o_orderdate"),
      col("o_orderpriority"))
    val badB = base.filter(col("o_orderkey") % 103 === 0)
      .withColumn("o_custkey", lit(null).cast("long"))
    val audited = base.unionByName(badA.select(base.columns.map(col): _*))
      .unionByName(badB)
    val a = audited.join(broadcast(c), audited("o_custkey") === c("c_custkey"), "left")
      .agg(
        count(lit(1)).as("row_count"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_price"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("bad_status"),
        sum(when(col("o_orderdate") < lit("1990-01-01").cast("timestamp") ||
                 col("o_orderdate") >= lit("2030-01-01").cast("timestamp"), 1L).otherwise(0L))
          .as("date_out_of_range"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
        sum(when(col("o_custkey").isNotNull && col("c_present").isNull, 1L).otherwise(0L))
          .as("orphan_custkey"))
    a.select(expr(
      """stack(7,
        |  'row_count', row_count,
        |  'null_custkey', null_custkey,
        |  'nonpositive_price', nonpositive_price,
        |  'bad_status', bad_status,
        |  'date_out_of_range', date_out_of_range,
        |  'dup_orderkey', dup_orderkey,
        |  'orphan_custkey', orphan_custkey) AS (check_name, n_bad)""".stripMargin))
  }

  /** As-of join: enrich each event with the most recent order (by
    * `o_orderdate <= ts`) of the matching customer — the temporal point-in-time
    * join Spark has no built-in operator for (cf. SURVEY §2B "joins": the
    * reference has only the id-equality lookup E1).
    *
    * Shape: union both sides tagged, ONE shuffle+sort on the join key, then a
    * running `last(..., ignoreNulls)` carries the latest order forward into
    * each event row. This is the canonical distributed as-of — no range
    * cross-product, no per-row subquery, and it scales as a single sort-merge
    * pass regardless of how many orders precede an event. Orders are first
    * reduced to one row per (custkey, orderdate) (keep max orderkey) so the
    * match is deterministic and oracle-checkable (DuckDB ASOF JOIN picks an
    * arbitrary row among exact-tie timestamps otherwise).
    */
  def asofLastOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val orders = Tables.load(spark, sfDir, "orders")
    val o = orders.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
           max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    val evSide = ev.select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("is_ev"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"))
    // order rows sort BEFORE event rows at equal timestamps (is_ev asc), so an
    // event at exactly o_orderdate sees that order — ASOF `ts >= o_orderdate`
    val oSide = o.select(
      col("o_custkey").cast("long").as("k"), col("o_orderdate").as("t"), lit(0).as("is_ev"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_ev"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evSide.unionByName(oSide)
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_ev") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        col("last_orderkey"), col("last_totalprice"))
  }

  /** Per-group Pearson correlation + OLS regression line (price on quantity
    * per return flag) from EXACT moment sums — deliberately NOT the built-in
    * `corr`/`regr_slope`: those accumulate doubles in partition order, so
    * two runs (or two engines) disagree in the last ulps and can never
    * hash-match. Here the five moments (Σx, Σy, Σx², Σy², Σxy) are exact
    * integer/decimal(38,0) sums — order-independent — and only the FINAL
    * closed-form formulas run in double, on identical exact inputs with an
    * identical operation sequence in both engines, so the rounded outputs
    * are bit-stable at any parallelism (the local[7]-vs-local[32] gate
    * proves it). One partial-agg'd shuffle; headroom: n·Σxy stays exact in
    * double-free decimal up to ~1e38, ample for 100 TB of cents-scale data.
    */
  /** Per-region Gini coefficient of customer revenue — the standard
    * concentration metric ("do 1% of customers carry the region?"). Computed
    * from the sorted-rank identity G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)
    * entirely in exact integer math (cents, decimal(38,0) sums, integer
    * division scaled to micro-units), so the output hash-matches any engine.
    * Tied revenues contribute the same Σi·xᵢ under any permutation of their
    * ranks (equal values × consecutive ranks), so the custkey tie-break makes
    * the FRAME deterministic without affecting the statistic.
    *
    * Shape: the fact collapses to customer grain FIRST (partial-agg sum of
    * cents — one shuffle at customer cardinality), then dims broadcast onto
    * the aggregate, then ONE window shuffle keyed by region ranks each
    * region's customers. The window partitions by region over
    * customer-cardinality rows — never over the fact. At 100 TB the rank
    * window within a giant region is the pressure point; the escape is
    * two-level ranking (the [[graft.ops.Curation.seqPack]] bucket-offset
    * trick) over revenue-range buckets, same shape as [[ksTest]]'s cumsum.
    */
  def giniConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val rev = o.groupBy(col("o_custkey"))
      .agg(sum((money(col("o_totalprice")) * 100).cast("long")).as("cents"))
    val withRegion = rev
      .join(broadcast(c.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_custkey"), col("cents"))
    val w = Window.partitionBy(col("r_name")).orderBy(col("cents"), col("o_custkey"))
    val d = "decimal(38,0)"
    withRegion
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("cents").cast(d)).as("s"),
        sum((col("i").cast(d) * col("cents").cast(d))).as("s1"))
      .select(
        col("r_name"), col("n_customers"),
        col("s").cast("long").as("sum_cents"),
        expr("CAST((2 * s1 - (n_customers + 1) * s) * 1000000 div (n_customers * s) AS BIGINT)")
          .as("gini_micro"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the order-price
    * distributions of two priority classes — the drift test a training
    * pipeline runs between data snapshots. D = max over the merged support of
    * |F₁(v) − F₂(v)| is kept RATIONAL: the maximized quantity is the integer
    * |cum₁·n₂ − cum₂·n₁| (common denominator n₁·n₂ applied once at the end),
    * so the statistic is hash-exact — no floating CDF accumulation anywhere.
    *
    * Shape: one conditional partial agg to value grain (distinct prices),
    * then the global running sums use a TWO-LEVEL prefix sum — per-bucket
    * subtotals (value range / 2²², bucket-cardinality window) feed exclusive
    * offsets, in-bucket cumsums run partitioned by bucket — so no
    * single-partition global-order window ever exists, the same
    * bucket-offset trick as [[graft.ops.Curation.seqPack]]. The argmax row is
    * TakeOrderedAndProject with the value as tie-break (first crossing wins),
    * emitting one row: D's numerator, the common denominator parts, the
    * micro-scaled ratio, and the price where the gap peaks.
    */
  def ksTest(spark: SparkSession, sfDir: String,
             priA: String = "1-URGENT", priB: String = "5-LOW"): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val cents = (money(col("o_totalprice")) * 100).cast("long")
    val byValue = o.filter(col("o_orderpriority").isin(priA, priB))
      .select(cents.as("v"),
        when(col("o_orderpriority") === priA, 1L).otherwise(0L).as("a"),
        when(col("o_orderpriority") === priB, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
      .withColumn("bucket", expr("v div 4194304"))
    val bucketTotals = byValue.groupBy(col("bucket"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("offa", coalesce(sum(col("ta")).over(wOff), lit(0L)))
      .withColumn("offb", coalesce(sum(col("tb")).over(wOff), lit(0L)))
      .select(col("bucket"), col("offa"), col("offb"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byValue.agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"))
    byValue
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum1", col("offa") + sum(col("ca")).over(wIn))
      .withColumn("cum2", col("offb") + sum(col("cb")).over(wIn))
      .crossJoin(broadcast(totals))
      .withColumn("d_num", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("d_num").desc, col("v"))
      .limit(1)
      .select(col("n1"), col("n2"), col("v").as("at_value_cents"), col("d_num"),
        expr("""CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000
               |     div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""".stripMargin)
          .as("d_micro"))
  }

  /** Hour-of-day seasonal decomposition of the event stream: observed hourly
    * counts split into the seasonal profile (mean count for that hour-of-day
    * across all days, milli-scaled integer division) and the residual — the
    * first pass of any traffic-anomaly or capacity model. Exact integers
    * throughout: seasonal = Σcounts·1000 div n_days, residual = cnt·1000 −
    * seasonal, so every row hash-matches.
    *
    * Shape: one partial agg to (day, hour) grain — the only fact-sized
    * shuffle; the 24-row seasonal profile and the one-row day census ride
    * back as broadcasts onto the aggregate. Hours with zero events on a
    * given day are absent rows (the profile denominator is the GLOBAL day
    * count, so absent cells depress the seasonal mean exactly as a zero row
    * would); [[gapFillDaily]] is the densification pass when downstream
    * needs explicit zeros.
    */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val cells = ev
      .select(date_trunc("day", col("ts")).as("day"), hour(col("ts")).as("hod"))
      .groupBy(col("day"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
    val profile = cells.groupBy(col("hod")).agg(sum(col("cnt")).as("tot"))
    val nDays = cells.select(col("day")).distinct().agg(count(lit(1)).as("n_days"))
    cells
      .join(broadcast(profile), Seq("hod"))
      .crossJoin(broadcast(nDays))
      .withColumn("seasonal_milli", expr("tot * 1000 div n_days"))
      .select(col("day"), col("hod").cast("long").as("hod"), col("cnt"),
        col("seasonal_milli"),
        (col("cnt") * 1000 - col("seasonal_milli")).as("residual_milli"))
  }

  /** Chi-square association cells between event type and day-of-week — "is
    * traffic mix independent of weekday?". Emits the PER-CELL decomposition
    * (observed, expected, contribution), not the summed statistic: each
    * cell's χ² term (o·N − r·c)²·10⁶ div (N·r·c) is exact integer arithmetic
    * on decimal(38,0), whereas the total would be a float sum in
    * engine-dependent order. Downstream sums the bounded cell table if it
    * wants the scalar (types × 7 rows — driver-side cheap).
    *
    * Shape: one partial agg to cell grain, then the row/column margins and
    * grand total are windows OVER THE CELL TABLE (35 rows — these windows
    * repartition nothing that matters), never over the fact. Day-of-week is
    * emitted in DuckDB numbering (Sunday = 0) so the oracle is a direct
    * transcription.
    */
  def chi2Association(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val cells = ev
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val d = "decimal(38,0)"
    cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .select(col("event_type"), col("dow"), col("o"),
        expr(s"CAST(CAST(r AS $d) * CAST(c AS $d) * 1000000 div CAST(n AS $d) AS BIGINT)")
          .as("exp_micro"),
        expr(s"""CAST(
          (CAST(o AS $d) * CAST(n AS $d) - CAST(r AS $d) * CAST(c AS $d)) *
          (CAST(o AS $d) * CAST(n AS $d) - CAST(r AS $d) * CAST(c AS $d)) * 1000000
          div (CAST(n AS $d) * CAST(r AS $d) * CAST(c AS $d)) AS BIGINT)""")
          .as("chi2_micro"))
  }

  /** Lag-k autocorrelation of the daily event-count series (k = 1..7) — the
    * seasonality detector that tells a pipeline WHICH lag [[seasonalDecompose]]
    * should model. Same numeric discipline as [[regressionStats]]: the five
    * moment sums per lag are exact integer sums over (x_t, x_{t+k}) pairs, and
    * only the final Pearson formula runs in double on identical exact inputs —
    * bit-stable at any parallelism, hash-checkable in any engine.
    *
    * Shape: the fact collapses to day grain first (one partial-agg shuffle);
    * the lag pairing is ONE window over the day series (days-cardinality
    * rows — at 100 TB the series is ~36.5k rows per century, driver-trivial),
    * unioned across the 7 lags in-plan; the moment aggregation is 7 groups.
    * Nothing fact-sized ever shuffles twice.
    */
  def autocorrelation(spark: SparkSession, sfDir: String, maxLag: Int = 7): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(
      Seq(col("day"), col("x")) ++
        (1 to maxLag).map(k => lead(col("x"), k).over(w).as(s"y$k")): _*)
    // unpivot the lag columns IN-ROW (stack generator), not via a 7-way
    // union — the union form re-plans the day-agg + window subtree once per
    // lag (7 scans, 14 exchanges in the audit); this is 1 scan, 2 shuffles
    val stackArgs = (1 to maxLag).map(k => s"${k}L, y$k").mkString(", ")
    val pairs = lagged
      .select(col("x"), expr(s"stack($maxLag, $stackArgs) AS (lag, y)"))
      .filter(col("y").isNotNull)
    val d = "decimal(38,0)"
    val agg = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d)).as("sxe"),
      sum(col("y").cast(d)).as("sye"),
      sum((col("x").cast(d) * col("x").cast(d))).as("sxxe"),
      sum((col("y").cast(d) * col("y").cast(d))).as("syye"),
      sum((col("x").cast(d) * col("y").cast(d))).as("sxye"))
    val nD = col("n").cast("double")
    val Seq(sx, sy, sxx, syy, sxy) =
      Seq("sxe", "sye", "sxxe", "syye", "sxye").map(c => col(c).cast("double"))
    agg.select(col("lag"), col("n"),
        round((nD * sxy - sx * sy) / sqrt((nD * sxx - sx * sx) * (nD * syy - sy * sy)), 6)
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** CUSUM changepoint detection on the daily event-count series: the day
    * where the centered cumulative sum S_t = Σ(n·x_i − T) peaks in absolute
    * value — the classic "where did the level shift?" scan statistic,
    * n-scaled so it stays INTEGER (x̄ = T/n is never materialized as a
    * float; S_t is exactly n·Σ(x_i − x̄)). Hash-exact: the argmax row is
    * deterministic with the day tie-break, and the output carries the raw
    * integer statistic plus its milli-scaled normalization.
    *
    * Shape: day-grain partial agg (the only fact-sized shuffle), then the
    * running sum over the day series uses the same two-level prefix-sum
    * trick as [[ksTest]] (month buckets feed exclusive offsets; in-bucket
    * cumsums run partitioned) — no single-partition global window even
    * though the series is small today; the shape survives a per-minute or
    * per-key series tomorrow. One-row output via TakeOrderedAndProject.
    */
  def cusumChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("bucket", date_trunc("month", col("day")))
    val totals = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("t"))
    val bucketTotals = daily.groupBy(col("bucket"))
      .agg(sum(col("x")).as("bx"), count(lit(1)).as("bn"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("offx", coalesce(sum(col("bx")).over(wOff), lit(0L)))
      .withColumn("offn", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .select(col("bucket"), col("offx"), col("offn"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cumx", col("offx") + sum(col("x")).over(wIn))
      .withColumn("cumn", col("offn") + count(lit(1)).over(wIn))
      .crossJoin(broadcast(totals))
      // S_t scaled by n: n*cumx - cumn*T  ==  n * Σ_{i<=t}(x_i - T/n)
      .withColumn("s_scaled", col("n") * col("cumx") - col("cumn") * col("t"))
      .withColumn("abs_s", abs(col("s_scaled")))
      .orderBy(col("abs_s").desc, col("day"))
      .limit(1)
      .select(col("day").as("change_day"), col("n").as("n_days"),
        col("t").as("total_events"), col("s_scaled"),
        expr("""CAST(CAST(abs_s AS DECIMAL(38,0)) * 1000
               |     div (CAST(n AS DECIMAL(38,0)) * t) AS BIGINT)""".stripMargin)
          .as("cusum_milli"))
  }

  /** TPC-H Q20 shape — double-nested correlated subqueries, decorrelated:
    * "dominant suppliers of scarce parts". Q20's inner correlation compares a
    * per-(part, supplier) availability against a correlated per-(part,
    * supplier) shipped-quantity aggregate, nested inside a part-name IN
    * filter, nested inside a supplier semi-join. This schema has no partsupp,
    * so the same *shape* runs entirely off the fact: a supplier dominates a
    * part when its 1996 shipped quantity exceeds 30% of the part's total
    * 1996 quantity across all suppliers.
    *
    * Decorrelation: the fact reduces ONCE to (part, supplier) grain — the
    * finest grain any consumer needs — and the per-part total comes from a
    * window SUM over that already-reduced frame (partitioned by part key),
    * not from a groupBy-then-self-join, which would re-plan the whole agg
    * subtree per consumer and scan the fact twice (same single-scan rewrite
    * as `ops_tfidf_terms`' df census; the window partitions part-grain data,
    * never fact-sized rows — windows are only a scale trap on the latter).
    * The dominance test compares in exact integer cross-multiplication
    * (qty_c * 10 > total_c * 3), so no engine's division rounding can flip a
    * boundary row. The part-name filter is a broadcast semi-join
    * (dim-sized), applied at the reduced grain. Never a correlated re-scan
    * per outer row.
    */
  def dominantPartSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
    val s = Tables.load(spark, sfDir, "supplier")
    val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(money(col("l_quantity"))) * 100).cast("long").as("qty_c"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    ps.withColumn("total_c",
        sum(col("qty_c")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty_c") * 10 > col("total_c") * 3)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
  }

  /** TPC-H Q22 shape — scalar-aggregate threshold + anti-join: "idle
    * high-balance customers" per market segment (the segment plays Q22's
    * country-code role; this schema has no phone column). Customers in the
    * three target segments whose balance exceeds the average positive
    * balance of that population AND who have never ordered, rolled up per
    * segment.
    *
    * The scalar subquery reduces the (broadcast-small) filtered customer set
    * to ONE (sum, count) row that rides back as a broadcast — and the
    * above-average test multiplies through instead of dividing (bal_c * n_c
    * > sum_c): the comparison stays in exact BIGINT, immune to avg()
    * rounding divergence between engines. The no-recent-orders test is a
    * LEFT ANTI join on the date-filtered order fact's customer key (idle =
    * nothing ordered since 2000; the date filter pushes to the scan) — at
    * 100 TB that is the one real shuffle here (orders project to the key
    * column only, then shuffle-partition by it); everything customer-sided
    * is dim-scale.
    */
  def idleRichCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val segs = Seq("BUILDING", "MACHINERY", "HOUSEHOLD")
    val c = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment").isin(segs: _*))
      .select(col("c_custkey"), col("c_mktsegment"),
        (money(col("c_acctbal")) * 100).cast("long").as("bal_c"))
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val stats = c.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n_c"))
    c.join(broadcast(stats))
      .filter(col("bal_c") * col("n_c") > col("sum_c"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("total_bal_c"))
  }

  /** TPC-H Q2 shape — min-cost supplier per part within one region: the
    * classic correlated-MIN subquery (`cost = (SELECT MIN(cost) ... WHERE
    * partkey = outer.partkey)`), decorrelated. This schema has no partsupp,
    * so the supply relation derives from the fact ONCE at (part, supplier)
    * grain with cost_c = MIN observed line price in cents — deterministic,
    * exact integer money, and the oracle mirrors the same derivation.
    *
    * The scale decisions: the p_size filter prunes the fact through a
    * broadcast join BEFORE its only shuffle, so the (part, supplier)
    * aggregation moves ~2% of lineitem, not all of it; the Europe supplier
    * slice is dim-sized and broadcasts; and the correlated MIN becomes a
    * window MIN partitioned by part key over the already-reduced grain
    * (part-grain rows, never fact-sized — the same single-scan
    * decorrelation as `dominantPartSuppliers`), with the equality filter
    * keeping exactly the tied minimum rows per part, which is Q2's
    * semantics (ties return every witness).
    */
  def minCostSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val eurSupp = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(regionNations(spark, sfDir, "EUROPE")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        (money(col("s_acctbal")) * 100).cast("long").as("bal_c"))
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(min((money(col("l_extendedprice")) * 100).cast("long")).as("cost_c"))
      .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_c",
        min(col("cost_c")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost_c") === col("min_c"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("bal_c"), col("cost_c"))
  }

  /** TPC-H Q11 shape — "important stock": per-part supplied value within one
    * region's suppliers, kept where the part's value exceeds a threshold
    * computed by a scalar subquery over the SAME aggregate. Q11's literal
    * fraction (0.0001/SF) must shrink with scale or the result set empties;
    * this shape makes the threshold scale-free instead — keep parts worth
    * more than 2× the mean part value — so the query is meaningful at every
    * SF without retuning, which is what a production data-health query
    * needs.
    *
    * The region supplier slice broadcasts and semi-join-prunes the fact
    * before its single shuffle to part grain. The scalar (total, count)
    * reduces the part-grain frame to ONE row that rides back as a broadcast
    * (the `idleRichCustomers` pattern), and the above-mean test
    * cross-multiplies (value·n > 2·total) instead of dividing — in
    * decimal(38,0) so the product cannot overflow int64 even at 100 TB
    * aggregate magnitudes (the oracle casts to HUGEINT explicitly for the
    * same headroom; DuckDB would raise, not widen, on a BIGINT overflow).
    */
  def importantStock(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaSupp = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(regionNations(spark, sfDir, "ASIA")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum((money(col("l_extendedprice")) * 100).cast("long")).as("value_c"))
    val tot = vals.agg(sum(col("value_c")).as("total_c"), count(lit(1)).as("n_parts"))
    vals.join(broadcast(tot))
      .filter(col("value_c").cast("decimal(38,0)") * col("n_parts") >
              col("total_c").cast("decimal(38,0)") * 2)
      .select(col("l_partkey"), col("value_c"))
  }

  /** TPC-H Q16 shape — supplier-relationship census: COUNT(DISTINCT
    * suppliers) per (brand, type, size) for a filtered part family,
    * excluding a supplier blocklist via NOT IN. The schema has no partsupp
    * or supplier comments, so the relation is the fact's (part, supplier)
    * pairs and the blocklist is a deterministic name predicate — topology
    * preserved: negated dim filters + IN-list on the dim, anti-join for the
    * exclusion, distinct-count aggregation.
    *
    * Both dim sides broadcast (the part family prunes the fact before any
    * shuffle; the blocklist anti-join is dim-sized). The only shuffle is
    * the distinct aggregation itself, which Spark runs as the standard
    * two-phase distinct expand — duplicate (part, supplier) lineitems
    * collapse map-side, so the exchange carries pair grain, not fact grain.
    */
  def supplierRelationCount(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand") =!= "Brand#45" &&
              !col("p_type").startsWith("MEDIUM") &&
              col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excl = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_name").endsWith("7"))
      .select(col("s_suppkey"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def regressionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val d = "decimal(38,0)"
    val agg = li
      .select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        (money(col("l_extendedprice")) * 100).cast("long").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d)).as("sxe"),
        sum(col("y").cast(d)).as("sye"),
        sum((col("x") * col("x")).cast(d)).as("sxxe"),
        sum((col("y").cast(d) * col("y").cast(d))).as("syye"),
        sum((col("x").cast(d) * col("y").cast(d))).as("sxye"))
    val nD = col("n").cast("double")
    val Seq(sx, sy, sxx, syy, sxy) =
      Seq("sxe", "sye", "sxxe", "syye", "sxye").map(c => col(c).cast("double"))
    val covn = nD * sxy - sx * sy
    val varxn = nD * sxx - sx * sx
    val varyn = nD * syy - sy * sy
    agg.select(
      col("l_returnflag"), col("n"),
      round(covn / sqrt(varxn * varyn), 6).as("corr"),
      round(covn / varxn, 6).as("slope"),
      round((sy - (covn / varxn) * sx) / nD, 6).as("intercept"))
  }

  // ===== TPC-H multi-way-join suite (Q5/Q7/Q8/Q9/Q10/Q12 shapes) =====
  //
  // The join-ORDER queries: five-to-seven-table plans where the win at
  // 100 TB is deciding which joins shuffle (fact⋈fact, on their keys) and
  // which broadcast (dims, or dim slices pruned by a selective filter
  // BEFORE the join). Each query below fixes that decision explicitly and
  // documents why it survives a 1000-executor scale-up; testdata lacks
  // partsupp / l_shipmode / l_commitdate, so Q9 and Q12 are adapted shapes
  // (cost basis from part.p_retailprice; lateness from shipdate vs
  // orderdate) with the join topology preserved.

  /** TPC-H Q5 shape — local-supplier volume: revenue per nation for orders
    * placed in one region and year where the SUPPLIER sits in the customer's
    * own nation. The plan: region⋈nation collapses to a 5-key broadcast
    * BEFORE touching facts; lineitem⋈orders shuffles on the order key (the
    * only fact⋈fact edge); customer — fact-sized at 100 TB even pruned to
    * one region — joins on its own key via shuffle, NEVER broadcast; the
    * supplier side ships only (suppkey, nationkey) and the "local" predicate
    * s_nationkey = c_nationkey rides the join condition, so non-local rows
    * die inside the join instead of in a post-filter. Aggregation is on the
    * integer nationkey; names attach to the 5-row aggregate afterwards.
    */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = regionNations(spark, sfDir, "ASIA")
    val c = Tables.load(spark, sfDir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val s = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      // merge hint: customer is fact-sized at 100 TB even pruned to one
      // region — the hint pins the scale-true shuffle shape so the benched
      // plan is the cluster plan (the lineDedup membership-join precedent)
      .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg((sum(discountedLine) * 10000).cast("long").as("rev_bp"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("rev_bp"))
  }

  /** TPC-H Q7 shape — bilateral trade volume: shipped revenue between two
    * named nations, per direction per ship-year. The two-nation filter is
    * maximally selective, so it prunes BOTH fact-adjacent sides before any
    * fact shuffle: supplier collapses to a broadcast keyed slice, customer
    * prunes via the same 2-key broadcast semi-join and then shuffles on its
    * own key. The asymmetric-pair predicate (supp ≠ cust nation) rides a
    * post-join filter on two broadcast-attached columns — by then each row
    * carries both nation names, and the grid is 2×2 minus the diagonal.
    */
  def tradeVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val pair = Seq("NATION_18", "NATION_19")
    val n = Tables.load(spark, sfDir, "nation")
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.load(spark, sfDir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      // merge hint: same customer-is-fact-sized reasoning as Q5
      .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(discountedLine) * 10000).cast("long").as("rev_bp"))
  }

  /** TPC-H Q8 shape — national market share: one nation's slice of a
    * region's yearly volume in one part type, as exact permille. Three
    * selective dims prune before the facts move: part (type slice) and
    * supplier ship as broadcasts; ASIA customers prune via a 5-key
    * semi-join then shuffle on custkey. The share is numerator-conditional
    * aggregation in ONE pass — sum(cents) and sum(cents WHERE supplier is
    * the focal nation) ride the same partial agg, so the share needs no
    * self-join and no window; integer cents before division keeps the
    * permille bit-exact across engines ([[revenueShare]] discipline).
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = regionNations(spark, sfDir, "ASIA").select(col("n_nationkey"))
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val s = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.load(spark, sfDir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    // ×10000 (basis points): the discounted product is a scale-4 decimal, so
    // bp sums are exactly integral — cents (×100) would leave a fraction that
    // Spark's cast truncates where DuckDB rounds (the q19/q14 lesson)
    val bp = discountedLine * 10000
    Tables.load(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("s_nationkey") === 7, bp).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("long").as("nation_vol_bp"),
        sum(bp).cast("long").as("total_vol_bp"))
      .select(col("o_year"), col("nation_vol_bp"), col("total_vol_bp"),
        expr("nation_vol_bp * 1000 div total_vol_bp").as("share_permille"))
  }

  /** TPC-H Q9 shape (adapted) — product-line profit by supplier nation and
    * order year. Testdata has no partsupp, so the cost basis is half the
    * part's retail price per unit (deterministic, join topology unchanged:
    * the part slice still prunes lineitem, profit still needs part, orders
    * and supplier on one fact row). Part (name slice) and supplier
    * broadcast; orders ships only (orderkey, year) into the one fact
    * shuffle. Profit stays in exact integer cents: revenue and cost are
    * summed as decimals in one partial agg, subtracted, THEN cast — the
    * money discipline that keeps the result partitioning-independent.
    */
  def profitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    // revBp is exactly integral (scale-4 decimal × 10000). costBp×5000 is
    // integral only while quantities are WHOLE (true of this data; a
    // fractional qty × odd cents can end in .5) — so the oracle wraps the
    // difference in trunc() to match Spark's truncating decimal→long cast
    // for ANY input, instead of betting correctness on the precondition
    val revBp = discountedLine * 10000
    val costBp = money(col("l_quantity")) * money(col("p_retailprice")) * 5000
    Tables.load(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(revBp) - sum(costBp)).cast("long").as("profit_bp"))
  }

  /** TPC-H Q10 shape — returned-item reporting: top 20 customers by revenue
    * lost to returns in one quarter. The fact side reduces FIRST: lineitem
    * (returnflag slice) ⋈ orders (quarter slice) shuffle on the order key
    * and collapse to per-customer cents — at 100 TB that aggregate is
    * orders-of-magnitude smaller than the customer table, so it is the
    * AGGREGATE that broadcasts into the customer join (the small side of a
    * join is decided by where the data is AFTER reduction, not by which
    * table is "dim"). The final cut is a TakeOrderedAndProject heap with a
    * custkey tie-break, never a global sort.
    */
  def returnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg((sum(discountedLine) * 10000).cast("long").as("rev_bp"))
    broadcast(perCust)
      .join(Tables.load(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("rev_bp"))
      .orderBy(col("rev_bp").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape (adapted) — priority lanes: per return-flag lane,
    * how many LATE lines (shipped >60 days after the order date — testdata
    * has no commit/receipt dates, so lateness is shipdate-vs-orderdate)
    * carried urgent-or-high orders vs the rest. The classic CASE-sum pair:
    * one fact⋈fact shuffle on the order key with the date predicate riding
    * the join condition (it needs both sides, so it evaluates inside the
    * join, before any row reaches the agg), then both lane counts ride one
    * partial agg — never two scans, never a pivot.
    */
  def priorityLanes(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(o,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q6 shape — the forecast-revenue-change probe: total discount
    * given on small-quantity 1996 lines inside a discount band. Zero joins,
    * zero windows: this query IS the pushdown showcase, and the whole point
    * of declaring it is the plan — all three predicates (shipdate range,
    * discount band, quantity cap) land in `PushedFilters` at the parquet
    * scan, `ReadSchema` narrows to the two money columns, and what's left is
    * a single-row partial agg riding whole-stage codegen. At 100 TB this
    * reads the row groups whose min/max stats survive the date range and
    * nothing else. Discount values are engine-shared doubles compared
    * against the same literals in both engines, so the band selects
    * identical rows; the summed product uses the repo-wide
    * decimal-before-sum discipline, reported in basis points.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(
        (sum(money(col("l_extendedprice")) * money(col("l_discount"))) * 10000)
          .cast("long").as("discount_rev_bp"),
        count(lit(1)).as("n_lines"))
}
