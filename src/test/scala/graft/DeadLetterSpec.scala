package graft

import graft.cdc.DeadLetter
import org.apache.spark.sql.types.StructType

/** Dead-letter split: the reference dies on one malformed payload
  * (`server.go:270-272`); we must route instead.
  */
class DeadLetterSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType.fromDDL("k INT")

  test("malformed payloads are routed to the dead-letter frame with a reason") {
    val df = Seq(
      (1L, """{"k":1}"""),
      (2L, """{not json"""),
      (3L, null.asInstanceOf[String]), // id-only tiered event: NOT dead
      (4L, """{"k":4}""")).toDF("id", "props")
    val (good, dead) = DeadLetter.split(df, "props", schema)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    val d = dead.collect()
    assert(d.length == 1 && d(0).getAs[Long]("id") == 2L)
    assert(d(0).getAs[String]("reason").contains("malformed"))
  }

  test("well-formed JSON missing a declared field is nonconforming (schema is enforced)") {
    val df = Seq(
      (1L, """{"k":1}"""),
      (2L, """{"other":2}""")).toDF("id", "props") // valid JSON, wrong shape
    val (good, dead) = DeadLetter.split(df, "props", schema)
    assert(good.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(dead.select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
