package graft

import graft.cdc.Tiering
import org.apache.spark.sql.functions.lit

/** Tiering-ladder boundary tests, inspired by the reference's generated sweep
  * across the 8000-byte NOTIFY limit (`server_test.go:189-222`): sizes chosen
  * to land just below / on / above each threshold, including the drop order
  * (previous before payload). Accounting is the full-notification splice
  * model (`queries.go:33` measures the WHOLE text): envelope bytes +
  * `,"payload":<p>` (11 separator bytes) + `,"previous":<v>` (12), a null
  * document contributing nothing. Default envelope `{}` = 2 bytes, so
  * full = 25 + |p| + |v| and payload-only = 13 + |p|.
  */
class TieringSpec extends SparkSuite {
  import spark.implicits._

  private def run(payload: String, previous: String, limit: Int,
                  envelope: String = "{}"): (Int, Option[String], Option[String]) = {
    val df = Seq((payload, previous)).toDF("payload", "previous")
    val r = Tiering.ladder(df, "payload", "previous", limit, envelope = lit(envelope)).collect()(0)
    (r.getAs[Int]("tier"), Option(r.getAs[String]("payload")), Option(r.getAs[String]("previous")))
  }

  test("under the limit: everything intact (tier 0)") {
    // full = 2 + (11+10) + (12+9) = 44 < 45
    assert(run("x" * 10, "y" * 9, 45) == (0, Some("x" * 10), Some("y" * 9)))
  }

  test("exactly at the limit counts as over (>= semantics, queries.go:33)") {
    // full = 44 >= 44; without previous = 2 + 21 = 23 < 44
    assert(run("x" * 10, "y" * 9, 44) == (1, Some("x" * 10), None))
  }

  test("over the limit: previous dropped first (tier 1)") {
    assert(run("x" * 10, "y" * 100, 45) == (1, Some("x" * 10), None))
  }

  test("payload alone still over: payload dropped too (tier 2, id-only)") {
    // without previous = 2 + 11 + 50 = 63 >= 45
    assert(run("x" * 50, "y" * 100, 45) == (2, None, None))
  }

  test("envelope bytes count toward the limit (queries.go:33 measures the whole text)") {
    val env = """{"schema":"public","table":"t","op":"UPDATE","id":"1"}""" // 54 bytes
    // full = 54 + (11+10) + (12+9) = 96: intact at 97, tiered at 96 — the
    // same documents that fit under a bare {} envelope (44 < 96) no longer do
    assert(run("x" * 10, "y" * 9, 97, env)._1 == 0)
    assert(run("x" * 10, "y" * 9, 96, env)._1 == 1)
  }

  test("reference limit is 8000 bytes") {
    assert(Tiering.NotifyLimit == 8000)
    // full = 2 + (11+7970) + (12+4) = 7999 / +1 byte of previous = 8000
    assert(run("x" * 7970, "y" * 4, Tiering.NotifyLimit)._1 == 0)
    assert(run("x" * 7970, "y" * 5, Tiering.NotifyLimit)._1 == 1)
    // payload alone: 2 + 11 + 7987 = 8000 — id-only
    assert(run("x" * 7987, "y" * 5, Tiering.NotifyLimit)._1 == 2)
  }
}
