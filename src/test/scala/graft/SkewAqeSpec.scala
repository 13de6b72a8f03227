package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** AQE skew-join handling vs the manual salt ([[graft.ops.Skew]]) — pins
  * WHEN each tool applies, on the same synthesized hot-key join:
  *
  *  - a bare skewed shuffle join IS split by AQE at runtime (`skew=true` in
  *    the final adaptive plan) — plain joins need no manual mitigation;
  *  - the SAME join feeding an aggregation on the join key is NOT split
  *    (splitting would break the one-partition-per-key layout the agg
  *    reuses, and OptimizeSkewedJoin refuses to add the extra shuffle), so
  *    the hot key rides one reducer end-to-end — exactly the case
  *    `Skew.saltedJoin` exists for: the salt spreads (key, salt) over
  *    reducers BEFORE the agg, planner-independent.
  *
  * Timings on this synthetic skew are recorded in BASELINE.md (round 5).
  */
class SkewAqeSpec extends SparkSuite {

  /** Run `body` under temporary conf values, restoring priors afterwards
    * (shared session — same discipline as [[TestSpark.withCodegenOnly]]).
    */
  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val priors = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally priors.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // one hot key carrying ~100k rows against a 100-key tail; dim is small but
  // merge-hinted (a broadcast join has no skew to mitigate)
  private def skewedInputs = {
    val fact = spark.range(200000).select(
      when(col("id") < 100000, 1L).otherwise(col("id") % 100 + 2).as("k"),
      col("id").as("payload"))
    val dim = spark.range(102).select(
      (col("id") + 1).as("k"), concat(lit("d"), col("id")).as("dval"))
    (fact, dim)
  }

  private val aqeSkewConfs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // thresholds scaled down so test-sized data trips the same machinery
    // production trips at 256MB partitions
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("AQE splits a bare skewed shuffle join at runtime (skew=true)") {
    withConf(aqeSkewConfs: _*) {
      val (fact, dim) = skewedInputs
      val joined = fact.join(dim.hint("merge"), Seq("k"))
      // execute THIS DataFrame's queryExecution (count() would plan a new
      // one and leave this adaptive plan unexecuted / non-final)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ, plan:\n$plan")
    }
  }

  test("AQE does NOT split when an aggregation pins the join partitioning — the salt's case") {
    withConf(aqeSkewConfs: _*) {
      val (fact, dim) = skewedInputs
      // same join, now feeding a groupBy on the join key: splitting the hot
      // partition would duplicate key groups across tasks, so AQE declines
      val plain = fact.join(dim.hint("merge"), Seq("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val plainRows = plain.collect()
      val plan = plain.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"expected AQE to refuse the split under a pinned partitioning, plan:\n$plan")
      // the manual salt spreads (k, salt) BEFORE the agg and must be
      // semantics-preserving: identical aggregate results
      val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, saltSrc = col("payload"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val got = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = plainRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.sameElements(want))
    }
  }
}
