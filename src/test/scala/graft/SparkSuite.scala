package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all Spark-backed suites. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  /** Run `body` with codegen forced (no interpreter fallback), restoring the
    * PRIOR conf values afterwards — the session is shared JVM-wide, so
    * restoring hard-coded defaults would clobber other suites' settings.
    */
  def withCodegenOnly[T](body: => T): T = {
    val fm = spark.conf.get("spark.sql.codegen.factoryMode")
    val fb = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
      spark.conf.set("spark.sql.codegen.fallback", fb)
    }
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** Wait until the query's FIRST source has committed through `target`
    * (a MemoryStream LongOffset — one increment per addData call).
    * `processAllAvailable` cannot be used on a transformWithState query in
    * `TimeMode.ProcessingTime`: the TTL machinery keeps scheduling batches,
    * so the no-new-data latch it waits on never sets. Progress rows are
    * emitted AFTER sink commit, so once the offset shows there the data is
    * queryable.
    */
  def awaitSourceOffset(q: org.apache.spark.sql.streaming.StreamingQuery,
                        target: Long, timeoutMs: Long = 60000): Unit = {
    val end = System.currentTimeMillis + timeoutMs
    def cur: Long = q.recentProgress.flatMap(_.sources.headOption)
      .flatMap(s => Option(s.endOffset))
      .map(_.replaceAll("[^0-9-]", "")).filter(_.nonEmpty).map(_.toLong)
      .foldLeft(-1L)(math.max)
    while (cur < target && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cur >= target, s"source stalled before offset $target (at $cur)")
  }
}
