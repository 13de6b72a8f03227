package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A hot join key sends all its rows to one reducer; AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) handles most
  * cases at runtime, but salting is the explicit, planner-independent tool
  * when the hot keys are known or AQE can't split (e.g., a following
  * aggregation pins the partitioning). Pattern: the fact side gets a
  * deterministic salt in [0, salts); the dimension side is replicated once per
  * salt value; the join key becomes (key, salt), spreading each hot key over
  * `salts` reducers at the cost of salts x |dim| replicated rows — the
  * standard trade for dimension tables far below fact-row counts.
  */
object Skew {

  /** Inner equi-join of `fact` to `dim` on `key`, salted. `saltSrc` must be a
    * deterministic fact-side column (NOT rand(): retries/speculation must
    * re-derive the same salt or rows are lost/duplicated under task replay).
    * The dim side carries a merge hint so the demo exercises the shuffle-join
    * path that salting exists for (a broadcast join needs no salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSrc: Column): DataFrame = {
    val fs = fact.withColumn("__salt", pmod(saltSrc, lit(salts)).cast("int"))
    val ds = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    fs.join(ds.hint("merge"), Seq(key, "__salt")).drop("__salt")
  }

  /** Demo query: purchase revenue per market segment through a salted
    * events-to-customer join. The DuckDB oracle is the PLAIN join — proving
    * the salted rewrite is semantics-preserving is exactly the check.
    */
  def saltedSegmentRevenue(spark: SparkSession, sfDir: String,
                           salts: Int = 8): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev, cust, "user_id", salts, col("event_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           sum(Relational.money(col("value"))).cast("double").as("sum_value"))
  }
}
