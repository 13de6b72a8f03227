package graft

import graft.functions.{MergePatch, VariantMergePatch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Variant-native merge patch must be SEMANTICALLY IDENTICAL to the
  * string expression: `to_json(variant_merge_patch(parse_json(a),
  * parse_json(b)))` byte-equal to `json_merge_patch(a, b)` — over the nine
  * nested/array/null edge-case families the nested-oracle corpus pins, and
  * under forced codegen.
  */
class VariantMergePatchSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // the cdc_changes_nested nine-case families, in raw form (same edges:
  // identical docs, scalar change, nested change, key added/removed,
  // explicit-null vs value, array changed/identical, scalar-vs-array)
  private val cases: Seq[(String, String)] = Seq(
    ("""{"a":1,"meta":{"x":2,"y":3}}""", """{"a":1,"meta":{"x":2,"y":3}}"""),
    ("""{"a":1,"meta":{"x":2,"y":3}}""", """{"a":2,"meta":{"x":2,"y":3}}"""),
    ("""{"a":1,"meta":{"x":2,"y":3}}""", """{"a":1,"meta":{"x":9,"y":3}}"""),
    ("""{"a":1,"meta":{"x":2,"y":3},"tag":"t"}""", """{"a":1,"meta":{"x":2,"y":3}}"""),
    ("""{"a":1,"meta":{"x":2,"y":3}}""", """{"a":1,"meta":{"x":2,"y":3},"extra":"old"}"""),
    ("""{"a":1,"n":null}""", """{"a":1,"n":7}"""),
    ("""{"a":1,"arr":[1]}""", """{"a":1,"arr":[1,2]}"""),
    ("""{"a":1,"arr":[1,2]}""", """{"a":1,"arr":[1,2]}"""),
    ("""{"a":1,"v":5}""", """{"a":1,"v":[5]}"""),
    // deep recursion + type-change-at-depth beyond the corpus families
    ("""{"o":{"p":{"q":1,"r":2}},"k":true}""", """{"o":{"p":{"q":1,"r":3}},"k":false}"""),
    ("""{"o":{"p":1}}""", """{"o":[1,2]}"""),
    ("""{"s":"x","d":1.5}""", """{"s":"x","d":1.25}"""))

  test("variant patch == string patch on every edge-case family") {
    cases.foreach { case (doc, prev) =>
      val row = Seq((doc, prev)).toDF("doc", "prev")
        .select(
          to_json(VariantMergePatch.variant_merge_patch(
            parse_json(col("doc")), parse_json(col("prev")))).as("vp"),
          MergePatch.json_merge_patch(col("doc"), col("prev")).as("sp"))
        .head()
      assert(row.getString(0) == row.getString(1),
        s"doc=$doc prev=$prev: variant=${row.getString(0)} string=${row.getString(1)}")
    }
  }

  test("null documents mean {} (patch.go:13-22), in both directions") {
    val df = Seq(("""{"a":1}""", null: String)).toDF("doc", "prev")
    val r1 = df.select(to_json(VariantMergePatch.variant_merge_patch(
      parse_json(col("doc")), parse_json(col("prev"))))).head().getString(0)
    assert(r1 == """{"a":null}""") // new key vanishes into the absent old doc
    val r2 = df.select(to_json(VariantMergePatch.variant_merge_patch(
      parse_json(col("prev")), parse_json(col("doc"))))).head().getString(0)
    assert(r2 == """{"a":1}""")
  }

  test("evaluates under forced codegen against non-foldable input") {
    TestSpark.withCodegenOnly {
      graft.functions.VariantMergePatchExpr.register(spark)
      val rows = spark.sql(
        """SELECT to_json(variant_merge_patch(
          |         parse_json(concat('{"a":', CAST(id AS STRING), ',"b":2}')),
          |         parse_json(CASE WHEN id % 3 = 2 THEN NULL
          |              ELSE concat('{"a":9,"b":', CAST(id AS STRING), '}') END)
          |       )) AS patch
          |FROM range(3)""".stripMargin).collect().map(_.getString(0))
      assert(rows(0) == """{"a":9,"b":0}""")
      assert(rows(1) == """{"a":9,"b":1}""")
      assert(rows(2) == """{"a":null,"b":null}""") // null old doc = {}
    }
  }

  test("patch applied to the new doc recovers the old doc (string-domain apply)") {
    cases.foreach { case (doc, prev) =>
      val vp = Seq((doc, prev)).toDF("doc", "prev")
        .select(to_json(VariantMergePatch.variant_merge_patch(
          parse_json(col("doc")), parse_json(col("prev"))))).head().getString(0)
      assert(MergePatch.applyMergePatch(doc, vp) == MergePatch.applyMergePatch(doc,
        MergePatch.createMergePatch(doc, prev)))
    }
  }
}
