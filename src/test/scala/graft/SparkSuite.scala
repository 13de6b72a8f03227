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
}
