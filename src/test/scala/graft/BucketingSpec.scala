package graft

import org.apache.spark.sql.functions._

/** Pins the co-located-join claim from the scale posture (README): tables
  * bucketed on the join key join with ZERO exchanges — the shuffle is paid
  * once at write time and amortized over every subsequent join, the standard
  * layout strategy for a 100 TB fact repeatedly joined on the same key.
  *
  * (A per-partition Sort remains in the plan: since 3.0 Spark deliberately
  * ignores bucket sort order on read — multiple files per bucket make it
  * untrustworthy in general — unless the legacy outputOrdering flag is set.
  * The Exchange is the 100 TB cost; sorting an already-clustered partition
  * is the cheap part.)
  */
class BucketingSpec extends SparkSuite {

  test("bucketed-by-key tables sort-merge join without a shuffle") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (tiny test tables would broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // repartition on the bucket key first: one writer task per bucket =>
      // ONE file per bucket, which is what lets the read side trust the
      // write-time sort (multiple sorted files per bucket would force a
      // merge re-sort at read)
      Tables.load(spark, sf, "orders").select(col("o_orderkey"), col("o_custkey"))
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      Tables.load(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      // and it computes the same thing as the plain join
      val plain = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucket pruning: a point lookup on the bucket key reads one bucket of eight") {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      // production subtlety worth pinning: the DisableUnnecessaryBucketedScan
      // rule turns OFF bucketed reading for filter-only queries (no operator
      // "needs" the hash distribution) — which also forfeits bucket PRUNING,
      // the very thing a point lookup wants. Disabling the auto rule restores
      // the pruned scan; at 100 TB that's reading 1/N of the table vs all of
      // it, so lookup-heavy workloads should pin this conf off.
      spark.conf.set(key, "false")
      Tables.load(spark, sf, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").saveAsTable("b_prune")
      val probe = spark.table("b_prune").filter(col("o_orderkey") === 42L)
      val p = probe.queryExecution.executedPlan.toString
      // the E1 point-lookup shape against a bucketed base: the scan itself
      // reports how many buckets survive — 7/8 of the table is never read
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$p")
      assert(probe.count() ==
        Tables.load(spark, sf, "orders").filter(col("o_orderkey") === 42L).count())
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS b_prune")
    }
  }
}
