package graft

/** Physical-plan invariants: the "is this the plan you'd want at 100 TB"
  * checks from SURVEY §7.2 step 5, made executable so regressions fail CI
  * instead of surfacing in a benchmark. Only plans are built — nothing runs.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_pricing: date filter reaches the parquet scan; unused columns pruned") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    // 7 of lineitem's 11 columns are needed; the scan must not read the rest
    assert(!p.contains("l_partkey"), "scan reads columns the query never uses")
    assert(!p.contains("l_suppkey"), "scan reads columns the query never uses")
  }

  test("ops_star_join_agg: dimension joins are broadcast (fact side never shuffles to join)") {
    val p = plan("ops_star_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), "a dim join fell back to sort-merge")
  }

  test("ops_anti_join plans as a broadcast anti join") {
    val p = plan("ops_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("top-k queries plan as TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("ops_sim_topk", "ops_sim_ivf")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
    }
  }

  test("ops_salted_join honors the merge hint (the shuffle-join path salting targets)") {
    val p = plan("ops_salted_join")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("aggregation queries keep partial aggregation (map-side combine)") {
    for (q <- Seq("q1_pricing", "cdc_op_counts", "ops_dedup_keys")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost partial aggregation:\n$p")
    }
  }

  test("ops_range_join: binning yields an equi-join, not a nested loop") {
    val p = plan("ops_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("no query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
    }
  }
}
