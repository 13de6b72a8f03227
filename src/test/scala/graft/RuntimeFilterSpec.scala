package graft

import org.apache.spark.sql.functions._

/** Runtime (bloom) filter injection — the shuffle-join complement to
  * broadcast-side pruning. When a shuffle join's build side carries a
  * selective predicate, Catalyst can inject a bloom filter of the build-side
  * join keys into the PROBE side's scan (`might_contain`), so fact rows that
  * cannot match are dropped at the scan instead of travelling through the
  * shuffle. At 100 TB that is the difference between shuffling the whole
  * fact table and shuffling the matching fraction — the same never-do-the-
  * work idea as partition pruning (LayoutSpec) and install-time table
  * pruning (F1), applied at run time to join keys.
  *
  * The thresholds exist because the filter costs a build-side pre-scan: at
  * production scale the defaults (creation side <= 10 MB, application side
  * >= 10 GB) gate it to joins where the trade wins. Test data is far below
  * the application-side floor, so the spec lowers it to prove the MECHANISM;
  * the conf knobs themselves are the production tuning surface.
  */
class RuntimeFilterSpec extends SparkSuite {

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects a bloom filter into the fact side of a shuffle join") {
    withConfs(
      // force the shuffle-join path: bloom filters are pointless (and not
      // injected) under a broadcast join, which prunes via the hash table
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val o = Tables.load(spark, sf, "orders")
      val c = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = o.join(c, col("o_custkey") === col("c_custkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // the filter must sit on the FACT (orders) side, keyed on the join key
      assert(optimized.contains("bloom_filter_agg"), optimized)
      // and the join still answers correctly with the filter in place
      assert(joined.count() > 0)
    }
  }

  test("without a selective build-side predicate no filter is injected (no blind overhead)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val o = Tables.load(spark, sf, "orders")
      val c = Tables.load(spark, sf, "customer")
      val optimized = o.join(c, col("o_custkey") === col("c_custkey"))
        .queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"),
        s"bloom filter injected without a selective predicate:\n$optimized")
    }
  }
}
