package graft

import graft.cdc.Promotion
import org.apache.spark.sql.functions._

class PromotionSpec extends SparkSuite {
  import spark.implicits._

  test("advisor ranks the ubiquitous key first; materialize produces typed columns with quarantine") {
    // the advisor half (oracle-gated as cdc_key_promotion): 'k' is in
    // every doc -> rank 1, full coverage, number
    val advice = SparkEntry.queries("cdc_key_promotion")(spark, sf)
      .orderBy("rnk").collect()
    assert(advice.head.getAs[String]("key") == "k")
    assert(advice.head.getAs[Long]("coverage_permille") == 1000L)
    assert(advice.head.getAs[String]("vtype") == "number")
    assert(advice.length == 4, s"fixture vocabulary: ${advice.toSeq}")

    // the materialization half: typed columns from advisor rows, with a
    // PLANTED minority-type row (k as a string) quarantining to NULL
    val docs = Seq(
      (1L, """{"k": 7, "plan": "pro", "flag": true}"""),
      (2L, """{"k": 2.5, "plan": "free", "flag": false}"""),
      (3L, """{"k": "oops", "plan": "pro", "flag": true}"""), // type flip
      (4L, """{"plan": "pro"}""")                              // sparse doc
    ).toDF("id", "payload")
    val out = Promotion.materialize(docs, "payload",
      Seq("k" -> "number", "plan" -> "string", "flag" -> "bool"))
      .orderBy("id")
    val rows = out.select("id", "k", "plan", "flag").collect()
    assert(rows(0).getDouble(1) == 7.0 && rows(0).getString(2) == "pro" &&
      rows(0).getBoolean(3))
    assert(rows(1).getDouble(1) == 2.5 && !rows(1).getBoolean(3))
    assert(rows(2).isNullAt(1), "minority-type value must quarantine to NULL")
    assert(rows(2).getString(2) == "pro")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(3), "absent keys are NULL")

    // narrow by construction: the promotion pass must never shuffle
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "promotion materialization must be a narrow projection")
  }
}
