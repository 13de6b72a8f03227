package graft

import graft.ops.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for skew mitigation (companion to `SkewAqeSpec`, numbers in
  * BASELINE.md): one hot key carrying half the fact vs a uniform tail,
  * joined to a merge-hinted dim, then aggregated on the join key — the
  * pinned-partitioning case AQE's skew split refuses. Variants:
  *
  *  - `plain_join`   bare join, AQE skew split handles it (skew=true)
  *  - `plain_agg`    join + groupBy(key): hot key rides ONE reducer
  *  - `salted_agg`   Skew.saltedJoin + groupBy(key): hot key spread 8-way
  *
  * Prints one JSON line, seconds per variant (min of 2 passes each).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def fact = spark.range(rows).select(
      when(col("id") % 2 === 0, 1L).otherwise(col("id") % 1000 + 2).as("k"),
      col("id").as("payload"))
    def dim = spark.range(1002).select(
      (col("id") + 1).as("k"), concat(lit("d"), col("id")).as("dval"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): (String, Double) = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> secs
    }

    val results = Seq(
      time("plain_join") { fact.join(dim.hint("merge"), Seq("k")) },
      time("plain_agg") {
        fact.join(dim.hint("merge"), Seq("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      },
      time("salted_agg") {
        Skew.saltedJoin(fact, dim, "k", salts = 8, saltSrc = col("payload"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      })
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_bench","rows":$rows,"variants":$qs}""")
    spark.stop()
  }
}
