package graft

import graft.cdc.Tiering
import org.apache.spark.sql.functions.col

/** Tiering-ladder boundary tests, inspired by the reference's generated sweep
  * across the 8000-byte NOTIFY limit (`server_test.go:189-222`): sizes chosen
  * to land just below / on / above each threshold, including the drop order
  * (previous before payload).
  */
class TieringSpec extends SparkSuite {
  import spark.implicits._

  private def run(payload: String, previous: String, limit: Int): (Int, Option[String], Option[String]) = {
    val df = Seq((payload, previous)).toDF("payload", "previous")
    val r = Tiering.ladder(df, "payload", "previous", limit).collect()(0)
    (r.getAs[Int]("tier"), Option(r.getAs[String]("payload")), Option(r.getAs[String]("previous")))
  }

  test("under the limit: everything intact (tier 0)") {
    assert(run("x" * 10, "y" * 9, 20) == (0, Some("x" * 10), Some("y" * 9)))
  }

  test("exactly at the limit counts as over (>= semantics, queries.go:33)") {
    assert(run("x" * 10, "y" * 10, 20) == (1, Some("x" * 10), None))
  }

  test("over the limit: previous dropped first (tier 1)") {
    assert(run("x" * 10, "y" * 100, 20) == (1, Some("x" * 10), None))
  }

  test("payload alone still over: payload dropped too (tier 2, id-only)") {
    assert(run("x" * 25, "y" * 100, 20) == (2, None, None))
  }

  test("reference limit is 8000 bytes") {
    assert(Tiering.NotifyLimit == 8000)
    assert(run("x" * 7995, "y" * 4, Tiering.NotifyLimit)._1 == 0)
    assert(run("x" * 7995, "y" * 5, Tiering.NotifyLimit)._1 == 1)
    assert(run("x" * 8000, "", Tiering.NotifyLimit)._1 == 2)
  }
}
