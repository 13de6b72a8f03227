package graft.oracles

/** DuckDB oracle SQL for the relational / events analytics set (TPC-H-ish
  * shapes, windows, joins, time series, product analytics). Extracted from
  * SparkEntry; key set and strings unchanged. Fragments: [[OracleFrags]].
  */
private[graft] object OpsOracles {
  import OracleFrags._

  val sql: Map[String, String] = Map(
    "ops_set_ops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error'""".stripMargin,
    "ops_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    // the raw sketch can't cross engines, but its ERROR BOUND can: Spark's
    // HLL++ is merge-order-insensitive, so the bound verdict is
    // deterministic and the oracle pins it literally TRUE next to the
    // exact counts (r8 — previously the inventory's one rows-only check).
    // 10% = 5 sigma for the rsd-0.02 sketch: wide enough that no
    // regenerated fixture can legitimately trip it, tight enough that a
    // broken sketch (off by multiples) still fails the hash (r9)
    "ops_approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  COUNT(*) AS n, TRUE AS within_10pct
        |FROM events GROUP BY event_type""".stripMargin,
    // the quantile-sketch gate (r9): approx_percentile's rank-error bound
    // is a DETERMINISTIC guarantee (not a sigma bound), so TRUE can never
    // false-fail on a regenerated fixture — the Spark side recomputes the
    // returned element's exact rank range and checks the contract
    "ops_quantile_sketch" ->
      """SELECT event_type, COUNT(*) AS n, TRUE AS within_rank_bound
        |FROM events GROUP BY event_type""".stripMargin,
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "ops_star_join_agg" ->
      s"""SELECT n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "ops_top_customers" ->
      """WITH spend AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_custkey, c_name, c_nationkey),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS rk
        |  FROM spend)
        |SELECT n_name, c_name, total_spend, CAST(rk AS BIGINT) AS rk
        |FROM ranked JOIN nation ON c_nationkey = n_nationkey
        |WHERE rk <= 3""".stripMargin,
    // twin of [[graft.ops.Relational.regressionStats]]: exact HUGEINT moment
    // sums, identical double-only closed forms at the end — the order of the
    // final double ops must mirror the Spark expressions exactly
    "ops_regression" ->
      """WITH b AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy
        |  FROM b GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
        |FROM a""".stripMargin,
    "ops_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "ops_cube" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, COUNT(*) AS n
        |FROM events GROUP BY CUBE (event_type, date_trunc('hour', ts))""".stripMargin,
    "ops_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')",
    "ops_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')",
    "ops_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,
    "ops_scalar_subquery" ->
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) >
        |  (SELECT CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |     // COUNT(*) AS BIGINT) FROM part)""".stripMargin,
    "ops_order_count_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "ops_window_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 1 DAY
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 AND ts <= t1 + INTERVAL 1 DAY
        |       GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events),
        |lv AS (
        |  SELECT u.user_id,
        |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS level
        |  FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |         LEFT JOIN s3 USING (user_id))
        |SELECT CAST(level AS BIGINT) AS level, COUNT(*) AS n_users
        |FROM lv GROUP BY level""".stripMargin,
    "ops_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM e GROUP BY event_type),
        |d AS (SELECT e.event_type, cents, med FROM e JOIN m USING (event_type)),
        |s AS (SELECT event_type, MAX(med) AS med,
        |        quantile_cont(ABS(cents - med), 0.5) AS mad, COUNT(*) AS n
        |      FROM d GROUP BY event_type)
        |SELECT e.event_type, MAX(s.med) AS med, MAX(s.mad) AS mad, MAX(s.n) AS n,
        |  CAST(SUM(CASE WHEN ABS(cents - s.med) > s.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN s USING (event_type) GROUP BY e.event_type""".stripMargin,
    "ops_q20_dominant_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT) AS qty_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (
        |  SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS total_c
        |  FROM ps GROUP BY l_partkey)
        |SELECT s_suppkey, s_name, COUNT(*) AS n_parts
        |FROM ps JOIN tot USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty_c * 10 > total_c * 3
        |GROUP BY s_suppkey, s_name""".stripMargin,
    // Q2/Q11/Q16 shapes: the supply relation derives from lineitem at
    // (part, supplier) grain — this schema has no partsupp — with the
    // derivation mirrored exactly between engines. MIN of BIGINT stays
    // BIGINT in DuckDB, but SUM widens to HUGEINT: every summed total is
    // CAST back before comparison. The Q11 threshold cross-multiplies with
    // EXPLICIT HUGEINT casts — DuckDB does NOT auto-widen BIGINT*BIGINT (it
    // raises on overflow, same as the gini/ks/chi2 oracles' guard), so the
    // casts keep the oracle exact at any scale, matching Spark's
    // decimal(38,0) product.
    "ops_q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey, p_brand, l_suppkey,
        |    MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cost_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15
        |  GROUP BY 1, 2, 3),
        |eur AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |w AS (
        |  SELECT l_partkey AS p_partkey, p_brand, s_name, n_name, bal_c, cost_c,
        |    MIN(cost_c) OVER (PARTITION BY l_partkey) AS min_c
        |  FROM ps JOIN eur ON l_suppkey = s_suppkey)
        |SELECT p_partkey, p_brand, s_name, n_name, bal_c, cost_c
        |FROM w WHERE cost_c = min_c""".stripMargin,
    "ops_q11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        |  GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(value_c) AS BIGINT) AS total_c, COUNT(*) AS n_parts FROM v)
        |SELECT l_partkey, value_c
        |FROM v, t
        |WHERE CAST(value_c AS HUGEINT) * n_parts > 2 * CAST(total_c AS HUGEINT)""".stripMargin,
    "ops_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY 1, 2, 3""".stripMargin,
    "ops_q22_idle_rich" ->
      """WITH seg AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')),
        |st AS (
        |  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, COUNT(*) AS n_c
        |  FROM seg WHERE bal_c > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
        |FROM seg, st
        |WHERE bal_c * n_c > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "ops_revenue_share" ->
      """WITH pn AS (
        |  SELECT r_name, n_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, cents,
        |  cents * 1000 // CAST(SUM(cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_permille
        |FROM pn""".stripMargin,
    "ops_transition_matrix" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, COUNT(*) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin,
    "ops_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cov AS (
        |  SELECT DISTINCT user_id, day + INTERVAL (o) DAY AS day
        |  FROM ud, generate_series(0, 6) AS t(o)),
        |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
        |wau AS (SELECT day, COUNT(*) AS wau FROM cov GROUP BY day)
        |SELECT dau.day AS day, dau.dau AS dau, wau.wau AS wau
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,
    "ops_cum_users" ->
      """WITH ed AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
        |fs AS (SELECT user_id, MIN(day) AS day FROM ed GROUP BY user_id),
        |nd AS (SELECT day, COUNT(*) AS n_new FROM fs GROUP BY day),
        |days AS (SELECT DISTINCT day FROM ed)
        |SELECT d.day, CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM days d LEFT JOIN nd ON d.day = nd.day""".stripMargin,
    "ops_full_outer" ->
      """WITH s AS (
        |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_signups
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT COALESCE(s.hour, p.hour) AS hour,
        |  CAST(COALESCE(n_signups, 0) AS BIGINT) AS n_signups,
        |  CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases
        |FROM s FULL OUTER JOIN p ON s.hour = p.hour""".stripMargin,
    "ops_except_all" ->
      """SELECT user_id, COUNT(*) AS n_excess FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |GROUP BY user_id""".stripMargin,
    "ops_funnel" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signups,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  MIN(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
        |  MAX(ts) FILTER (WHERE event_type = 'purchase') AS last_purchase,
        |  COALESCE(MIN(ts) FILTER (WHERE event_type = 'signup')
        |         < MAX(ts) FILTER (WHERE event_type = 'purchase'), FALSE) AS converted
        |FROM events GROUP BY user_id""".stripMargin,
    "ops_cohort_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "ops_unpivot" ->
      """WITH w AS (
        |  SELECT c_mktsegment, COUNT(*) AS n_customers,
        |    -- DuckDB SUM(BIGINT) widens to HUGEINT; pin BIGINT for the long
        |    -- `value` column the UNION produces
        |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_cents,
        |    COUNT(DISTINCT c_nationkey) AS n_nations
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM w
        |UNION ALL SELECT c_mktsegment, 'acctbal_cents', acctbal_cents FROM w
        |UNION ALL SELECT c_mktsegment, 'n_nations', n_nations FROM w""".stripMargin,
    "ops_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gmask
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "ops_rank_suite" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "ops_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
        |counts AS (SELECT user_id, day, COUNT(*) AS n FROM e GROUP BY user_id, day),
        |spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY user_id),
        |cal AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS TIMESTAMP) AS day
        |  FROM spans)
        |SELECT cal.user_id, cal.day, COALESCE(counts.n, 0) AS n
        |FROM cal LEFT JOIN counts ON cal.user_id = counts.user_id AND cal.day = counts.day""".stripMargin,
    "ops_ffill" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS sparse_value,
        |  LAST_VALUE(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM events""".stripMargin,
    "ops_event_windows" ->
      """SELECT event_id, user_id, event_type,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |FROM events""".stripMargin,
    "ops_hourly_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ops_dedup_keys" ->
      "SELECT user_id, event_type, MIN(event_id) AS keep_id, COUNT(*) AS n_dups FROM events GROUP BY user_id, event_type",
    "ops_q6_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS discount_rev_bp,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    // the oracle reads the PARQUET original: the text serialization must
    // not change answers, and the three planted corrupt lines must all
    // land in the constant dead-letter row
    "ops_json_source" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT '_corrupt', 3, CAST(NULL AS DOUBLE), 0""".stripMargin,
    // same parquet-original rule; the three RFC 4180 hostile-valid rows are
    // pinned as exact constant groups (embedded separator, doubled quote,
    // embedded newline) — the hash only matches if the decoder fully
    // decoded each quoting case
    "ops_csv_source" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL SELECT '_corrupt', 3, CAST(NULL AS DOUBLE), 0
        |UNION ALL SELECT 'a,b', 1, CAST(1.5 AS DOUBLE), 1
        |UNION ALL SELECT 'say "hi"', 1, CAST(2.25 AS DOUBLE), 1
        |UNION ALL SELECT concat('line', chr(10), 'break'), 1, CAST(3.75 AS DOUBLE), 1""".stripMargin,
    // columnar-to-columnar: the ORC round-trip's filtered aggregate from
    // the parquet original
    "ops_orc_source" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE value >= 100.0 GROUP BY event_type""".stripMargin,
    // compression must not change answers: the gzip drop's oracle is the
    // JSON drop's verbatim
    "ops_gz_source" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT '_corrupt', 3, CAST(NULL AS DOUBLE), 0""".stripMargin,
    // the staging pass (gz -> repartitioned zstd parquet) must not change
    // answers either: the staged aggregate's oracle is the drop's verbatim
    "ops_gz_staged" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT '_corrupt', 3, CAST(NULL AS DOUBLE), 0""".stripMargin,
    // entity erasure: per-day kept/removed recomputed from the raw table —
    // null-key rows must SURVIVE an erasure (IS NULL OR <>), and the
    // audit's removed count must equal exactly the target's per-day rows
    "ops_erase_entity" ->
      """WITH tgt AS (SELECT MIN(user_id) AS u FROM events)
        |SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |  CAST(COUNT(CASE WHEN user_id IS NULL
        |    OR user_id <> (SELECT u FROM tgt) THEN 1 END) AS BIGINT) AS kept_n,
        |  CAST(SUM(CASE WHEN user_id IS NULL
        |    OR user_id <> (SELECT u FROM tgt) THEN event_id END) AS BIGINT) AS kept_sum,
        |  CAST(COUNT(CASE WHEN user_id = (SELECT u FROM tgt) THEN 1 END) AS BIGINT) AS removed_n
        |FROM events GROUP BY 1""".stripMargin,
    // batched erasure: per-(user, day) removal audit for the three
    // smallest entities plus the day's survivor census — the shared-day
    // rewrite must keep exactly the other users' rows
    "ops_erase_batch" ->
      """WITH tgt AS (
        |  SELECT DISTINCT user_id AS u FROM events
        |  WHERE user_id IS NOT NULL ORDER BY user_id LIMIT 3),
        |rem AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS removed_n
        |  FROM events WHERE user_id IN (SELECT u FROM tgt)
        |  GROUP BY 1, 2),
        |kept AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE user_id IS NULL OR user_id NOT IN (SELECT u FROM tgt)
        |  GROUP BY 1)
        |SELECT r.user_id, CAST(r.d AS VARCHAR) AS day, r.removed_n,
        |  CAST(COALESCE(k.n, 0) AS BIGINT) AS day_kept_n
        |FROM rem r LEFT JOIN kept k ON r.d = k.d""".stripMargin,
    // the oracle joins the UNBUCKETED parquet: bucketing is layout, and
    // layout must never change answers
    "ops_bucket_join" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp,
         |  COUNT(*) AS n_lines
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "ops_zorder" ->
      s"""WITH e AS (
         |  SELECT user_id,
         |    (CAST(floor(epoch(ts)) AS BIGINT) -
         |     CAST(floor(epoch(TIMESTAMP '2024-01-01')) AS BIGINT)) // 32 AS su
         |  FROM events),
         |s AS (SELECT MIN(user_id) AS amn, MAX(user_id) AS amx,
         |             MIN(su) AS bmn, MAX(su) AS bmx FROM e),
         |q AS (SELECT user_id, su,
         |        ((user_id - amn) * 256) // (amx - amn + 1) AS qa,
         |        ((su - bmn) * 256) // (bmx - bmn + 1) AS qb FROM e, s),
         |z AS (SELECT user_id, su, (${zInterleaveSql("qa", "qb", 8)}) AS z FROM q)
         |SELECT z // 2048 AS bucket, COUNT(*) AS n,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  CAST(MAX(su) - MIN(su) AS BIGINT) AS span32
         |FROM z GROUP BY bucket""".stripMargin,
    "ops_range_join" ->
      """SELECT o_orderkey, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
        |FROM orders o LEFT JOIN events e
        |  ON e.user_id = o.o_custkey
        |  AND e.ts >= o.o_orderdate
        |  AND e.ts < o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderkey""".stripMargin,
    "ops_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    "ops_corr_subquery" ->
      """WITH q AS (
        |  SELECT l_partkey, l_extendedprice,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
        |  FROM lineitem),
        |a AS (SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS sum_qc, COUNT(1) AS n_li
        |      FROM q GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_rows
        |FROM q JOIN a USING (l_partkey) JOIN part ON l_partkey = p_partkey
        |WHERE qty_c * 5 * n_li < sum_qc
        |GROUP BY p_brand""".stripMargin,
    "ops_q19_disjuncts" ->
      s"""SELECT
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS revenue_bp,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "ops_q14_promo" ->
      s"""WITH j AS (
         |  SELECT $discPrice AS disc, p_type
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
         |SELECT
         |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS BIGINT) AS promo_bp,
         |  CAST(SUM(disc) * 10000 AS BIGINT) AS total_bp,
         |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS BIGINT) * 1000
         |    // CAST(SUM(disc) * 10000 AS BIGINT) AS BIGINT) AS promo_permille
         |FROM j""".stripMargin,
    "ops_drawdown" ->
      """WITH d AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT day, cents,
        |  CAST(MAX(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_cents,
        |  CAST(MAX(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cents AS BIGINT) AS drawdown_cents
        |FROM d""".stripMargin,
    "ops_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |g AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY digit),
        |e(digit, expected_permille) AS (VALUES (1, 301), (2, 176), (3, 125),
        |  (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
        |SELECT g.digit, g.n_orders,
        |  CAST(1000 * n_orders // CAST(SUM(n_orders) OVER () AS BIGINT) AS BIGINT) AS observed_permille,
        |  CAST(e.expected_permille AS BIGINT) AS expected_permille,
        |  CAST(abs(1000 * n_orders // CAST(SUM(n_orders) OVER () AS BIGINT)
        |    - e.expected_permille) AS BIGINT) AS deviation_permille
        |FROM g JOIN e ON g.digit = e.digit""".stripMargin,
    "ops_q4_late_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "ops_q3_ship_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY rev_bp DESC, l_orderkey LIMIT 10""".stripMargin,
    "ops_q5_local_volume" ->
      s"""SELECT n_name, CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "ops_q7_trade_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_18', 'NATION_19')
         |  AND n2.n_name IN ('NATION_18', 'NATION_19')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3""".stripMargin,
    "ops_q8_market_share" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, s_nationkey,
         |    $discPrice * 10000 AS bp
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
         |SELECT o_year,
         |  CAST(SUM(CASE WHEN s_nationkey = 7 THEN bp ELSE 0 END) AS BIGINT) AS nation_vol_bp,
         |  CAST(SUM(bp) AS BIGINT) AS total_vol_bp,
         |  CAST(CAST(SUM(CASE WHEN s_nationkey = 7 THEN bp ELSE 0 END) AS BIGINT) * 1000
         |    // CAST(SUM(bp) AS BIGINT) AS BIGINT) AS share_permille
         |FROM vol GROUP BY o_year""".stripMargin,
    "ops_q9_profit" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(trunc(SUM($discPrice * 10000)
         |     - SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2)) * 5000))
         |    AS BIGINT) AS profit_bp
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY n_name, o_year""".stripMargin,
    "ops_q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name, c_acctbal,
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY rev_bp DESC, c_custkey LIMIT 20""".stripMargin,
    "ops_q12_priority_lanes" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag""".stripMargin,
    "ops_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS rev_bp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, rev_bp
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_bp = (SELECT MAX(rev_bp) FROM rev)""".stripMargin,
    "ops_q18_large_orders" ->
      """WITH oq AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_c
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, qty_c
        |FROM oq JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE qty_c > 15000
        |ORDER BY qty_c DESC, o_orderkey LIMIT 100""".stripMargin,
    "ops_q21_waiting" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_bad
        |  FROM lineitem GROUP BY l_orderkey),
        |target AS (SELECT l_orderkey FROM per_order WHERE n_supp >= 2 AND n_bad = 1),
        |bad AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_name, COUNT(1) AS numwait
        |FROM bad JOIN target USING (l_orderkey) JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin,
    "ops_dq_audit" ->
      """WITH badA AS (
        |  SELECT o_orderkey, -o_custkey AS o_custkey, 'X' AS o_orderstatus,
        |    -o_totalprice AS o_totalprice,
        |    o_orderdate + INTERVAL 100 YEAR AS o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |badB AS (
        |  SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 103 = 0),
        |audited AS (
        |  SELECT * FROM orders UNION ALL SELECT * FROM badA UNION ALL SELECT * FROM badB),
        |a AS (
        |  SELECT COUNT(1) AS row_count,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_price,
        |    SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status,
        |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
        |             OR o_orderdate >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS date_out_of_range,
        |    COUNT(1) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
        |    SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL THEN 1 ELSE 0 END) AS orphan_custkey
        |  FROM audited LEFT JOIN customer ON o_custkey = c_custkey)
        |SELECT 'row_count' AS check_name, CAST(row_count AS BIGINT) AS n_bad FROM a
        |UNION ALL SELECT 'null_custkey', CAST(null_custkey AS BIGINT) FROM a
        |UNION ALL SELECT 'nonpositive_price', CAST(nonpositive_price AS BIGINT) FROM a
        |UNION ALL SELECT 'bad_status', CAST(bad_status AS BIGINT) FROM a
        |UNION ALL SELECT 'date_out_of_range', CAST(date_out_of_range AS BIGINT) FROM a
        |UNION ALL SELECT 'dup_orderkey', CAST(dup_orderkey AS BIGINT) FROM a
        |UNION ALL SELECT 'orphan_custkey', CAST(orphan_custkey AS BIGINT) FROM a""".stripMargin,
    "ops_moving_avg" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(cents) OVER wrows AS BIGINT) AS mov_sum_cents,
        |  CAST(COUNT(1) OVER wrows AS BIGINT) AS n_frame,
        |  CAST(COUNT(1) OVER wrange AS BIGINT) AS n_last_hour,
        |  CAST(SUM(cents) OVER wrows AS BIGINT) // CAST(COUNT(1) OVER wrows AS BIGINT) AS mov_avg_cents
        |FROM e
        |WINDOW
        |  wrows AS (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        |  wrange AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ops_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
        |         max_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    // twin of [[graft.ops.Relational.giniConcentration]]: sorted-rank Gini
    // from exact integer sums; HUGEINT guards the rank-weighted products
    // (same widening hazard class as the revenue_share window SUM).
    "ops_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT r_name, o_custkey, cents,
        |    CAST(row_number() OVER (PARTITION BY r_name ORDER BY cents, o_custkey) AS BIGINT) AS i
        |  FROM rev
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  CAST((2 * SUM(CAST(i AS HUGEINT) * cents) - (COUNT(*) + 1) * SUM(CAST(cents AS HUGEINT)))
        |       * 1000000 // (COUNT(*) * SUM(CAST(cents AS HUGEINT))) AS BIGINT) AS gini_micro
        |FROM ranked GROUP BY r_name""".stripMargin,
    // twin of [[graft.ops.Relational.ksTest]]: the oracle uses the plain
    // global cumsum (correctness only); the Spark side's two-level prefix
    // sum must produce the identical CDF.
    "ops_ks_test" ->
      """WITH f AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS b
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |byv AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
        |        FROM f GROUP BY v),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n1, CAST(SUM(cb) AS BIGINT) AS n2 FROM byv),
        |cum AS (
        |  SELECT v,
        |    SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM byv)
        |SELECT n1, n2, v AS at_value_cents,
        |  CAST(abs(cum1 * n2 - cum2 * n1) AS BIGINT) AS d_num,
        |  CAST(CAST(abs(cum1 * n2 - cum2 * n1) AS HUGEINT) * 1000000 // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d_micro
        |FROM cum, t
        |ORDER BY d_num DESC, v LIMIT 1""".stripMargin,
    // twin of [[graft.ops.Relational.seasonalDecompose]].
    "ops_seasonal" ->
      """WITH cells AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |prof AS (SELECT hod, CAST(SUM(cnt) AS BIGINT) AS tot FROM cells GROUP BY hod),
        |nd AS (SELECT COUNT(DISTINCT day) AS n_days FROM cells)
        |SELECT day, hod, cnt,
        |  CAST(tot * 1000 // n_days AS BIGINT) AS seasonal_milli,
        |  CAST(cnt * 1000 - tot * 1000 // n_days AS BIGINT) AS residual_milli
        |FROM cells JOIN prof USING (hod) CROSS JOIN nd""".stripMargin,
    // twin of [[graft.ops.Relational.autocorrelation]]: exact HUGEINT moment
    // sums per lag, Pearson formula in double on identical inputs (the
    // ops_regression discipline applied to the lagged series).
    "ops_autocorr" -> {
      val leads = (1 to 7).map(k => s"lead(x, $k) OVER (ORDER BY day) AS y$k").mkString(",\n|    ")
      val arms = (1 to 7).map(k =>
        s"SELECT $k AS lag, x, y$k AS y FROM l WHERE y$k IS NOT NULL")
        .mkString("\n|  UNION ALL ")
      s"""WITH daily AS (
         |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS x
         |  FROM events GROUP BY 1),
         |l AS (
         |  SELECT day, x,
         |    $leads
         |  FROM daily),
         |pairs AS (
         |  $arms),
         |a AS (
         |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy
         |  FROM pairs GROUP BY lag)
         |SELECT CAST(lag AS BIGINT) AS lag, n,
         |  round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
         |FROM a ORDER BY lag""".stripMargin
    },
    // twin of [[graft.ops.Relational.cusumChangepoint]]: the oracle runs the
    // plain global cumsum; the Spark side's two-level prefix sum must land on
    // the identical S_t series.
    "ops_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t FROM daily),
        |cum AS (
        |  SELECT day,
        |    CAST(SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumx,
        |    CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn
        |  FROM daily)
        |SELECT day AS change_day, n AS n_days, t AS total_events,
        |  CAST(n * cumx - cumn * t AS BIGINT) AS s_scaled,
        |  CAST(CAST(abs(n * cumx - cumn * t) AS HUGEINT) * 1000
        |       // (CAST(n AS HUGEINT) * t) AS BIGINT) AS cusum_milli
        |FROM cum, t
        |ORDER BY abs(n * cumx - cumn * t) DESC, day LIMIT 1""".stripMargin,
    // twin of [[graft.ops.Relational.chi2Association]]; dow is DuckDB
    // numbering (Sunday = 0) on both sides.
    "ops_chi2" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow, COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, o,
        |    SUM(o) OVER (PARTITION BY event_type) AS r,
        |    SUM(o) OVER (PARTITION BY dow) AS c,
        |    SUM(o) OVER () AS n
        |  FROM cells)
        |SELECT event_type, dow, o,
        |  CAST(CAST(r AS HUGEINT) * c * 1000000 // n AS BIGINT) AS exp_micro,
        |  CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |     * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) * 1000000
        |     // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS chi2_micro
        |FROM m""".stripMargin,

    // twin of [[graft.ops.BloomMembership.bloomPrune]] — the bloom is a
    // pure pruning device, so the oracle is the plain exact join it
    // accelerates
    "ops_bloom_prune" ->
      s"""SELECT p_brand,
         |  CAST(SUM($discPrice) * 10000 AS BIGINT) AS rev_bp,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 5
         |GROUP BY 1""".stripMargin,
  )
}
