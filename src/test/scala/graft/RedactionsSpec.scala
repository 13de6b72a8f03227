package graft

import graft.cdc.Redactions
import org.scalatest.funsuite.AnyFunSuite

/** Redaction cases mirroring the reference (`redactions_test.go:13-19, 26-101`
  * and the config format of `README.md:68-74`).
  */
class RedactionsSpec extends AnyFunSuite {

  val config = """{"public":{"users":["password","email"]}}"""

  test("decode reference config JSON") {
    val r = Redactions.decode(config)
    assert(r == Map("public" -> Map("users" -> Seq("password", "email"))))
  }

  test("matching fields are deleted from payload") {
    val payload =
      """{"first_name":"jane","last_name":"doe","password":"s3cret","email":"j@d.io"}"""
    val out = Redactions.redactJson(payload, Seq("password", "email"))
    assert(out == """{"first_name":"jane","last_name":"doe"}""")
  }

  test("non-matching payload passes through byte-identical") {
    val payload = """{"first_name": "jane",  "last_name": "doe"}"""
    assert(Redactions.redactJson(payload, Seq("password", "email")) eq payload)
  }

  test("null payload stays null") {
    assert(Redactions.redactJson(null, Seq("password")) == null)
  }

  test("redacting every field leaves {}") {
    assert(Redactions.redactJson("""{"k": 87}""", Seq("k")) == "{}")
  }

  test("applyMap: both schema AND table must match (redactions.go:38-44)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("public", "users", """{"password":"x","name":"jane"}"""),
      ("public", "notes", """{"password":"x","name":"n"}"""),   // table not in map
      ("other", "users", """{"password":"x","name":"o"}"""))    // schema not in map
      .toDF("schema", "table", "payload")
    val map = Redactions.decode(config)
    val out = rows
      .select(Redactions.applyMap(col("payload"), col("schema"), col("table"), map).as("p"))
      .as[String].collect()
    assert(out(0) == """{"name":"jane"}""")
    assert(out(1) == """{"password":"x","name":"n"}""")
    assert(out(2) == """{"password":"x","name":"o"}""")
  }

  test("variant_redact: native Variant twin matches the string expression") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      """{"password":"x","name":"jane","meta":{"a":1}}""", // drop one of three
      """{"name":"n"}""",                                  // no-match passthrough
      """{"password":"x"}""",                              // redact-to-empty
      """[1,2,3]""",                                       // non-object passthrough
      """7""").toDF("payload")
    val out = docs.select(
      to_json(graft.functions.VariantRedact.variant_redact(
        parse_json(col("payload")), "password")).as("v")).as[String].collect()
    assert(out(0) == """{"meta":{"a":1},"name":"jane"}""") // variant keys sort
    assert(out(1) == """{"name":"n"}""")
    assert(out(2) == "{}")
    assert(out(3) == "[1,2,3]")
    assert(out(4) == "7")
    // null payload stays null
    val n = Seq((null: String)).toDF("payload")
      .select(graft.functions.VariantRedact.variant_redact(
        parse_json(col("payload")), "password").as("v"))
      .select(col("v").isNull).head().getBoolean(0)
    assert(n)
  }

  test("variant_redact evaluates under forced codegen") {
    val spark = TestSpark.spark
    TestSpark.withCodegenOnly {
      import org.apache.spark.sql.functions._
      val out = spark.range(3).select(
        to_json(graft.functions.VariantRedact.variant_redact(
          parse_json(concat(lit("""{"k":"""), col("id").cast("string"), lit(""","secret":1}"""))),
          "secret")).as("p"))
        .collect().map(_.getString(0))
      assert(out.toSeq == Seq("""{"k":0}""", """{"k":1}""", """{"k":2}"""))
    }
  }

  test("native json_redact evaluates under forced codegen") {
    val spark = TestSpark.spark
    TestSpark.withCodegenOnly {
      import org.apache.spark.sql.functions._
      // range-derived JSON: non-foldable, so Java IS generated (cf. MergePatchSpec)
      val out = spark.range(3).select(
        graft.functions.JsonRedactColumn(
          concat(lit("""{"k":"""), col("id").cast("string"), lit(""","secret":1}""")),
          Seq("secret")).as("p"))
        .collect().map(_.getString(0))
      assert(out.toSeq == Seq("""{"k":0}""", """{"k":1}""", """{"k":2}"""))
    }
  }
}
