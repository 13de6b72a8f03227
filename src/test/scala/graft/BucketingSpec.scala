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
}
