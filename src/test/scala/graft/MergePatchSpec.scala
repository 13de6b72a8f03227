package graft

import graft.functions.MergePatch
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property tests for the RFC 7386 merge patch.
  *
  * Table cases lifted from the reference (`patch_test.go:22-32`) plus RFC 7386
  * semantics; the round-trip property is strictly stronger than the
  * reference's assertions (SURVEY §5).
  */
class MergePatchSpec extends AnyFunSuite {

  // --- reference table cases (patch_test.go:22-32) ---
  test("nils -> {}") {
    assert(MergePatch.createMergePatch(null, null) == "{}")
  }
  test("empties -> {}") {
    assert(MergePatch.createMergePatch("{}", "{}") == "{}")
  }
  test("{} vs {foo:bar} -> {foo:bar}") {
    assert(MergePatch.createMergePatch("{}", """{"foo":"bar"}""") == """{"foo":"bar"}""")
  }

  test("native expression evaluates under forced codegen (doGenCode is real)") {
    // A VALUES relation folds to a LocalRelation at optimization time (with the
    // interpreted path), so it would never exercise doGenCode. Derive the JSON
    // from spark.range — non-foldable — so Java IS generated, and forbid the
    // interpreter fallback: with a broken doGenCode this test must fail.
    val spark = TestSpark.spark
    TestSpark.withCodegenOnly {
      graft.functions.JsonMergePatch.register(spark)
      val rows = spark.sql(
        """SELECT json_merge_patch(
          |         concat('{"a":', CAST(id AS STRING), ',"b":2}'),
          |         CASE WHEN id % 3 = 2 THEN NULL
          |              ELSE concat('{"a":9,"b":', CAST(id AS STRING), '}') END
          |       ) AS patch
          |FROM range(3)""".stripMargin).collect().map(_.getString(0))
      // id=0: curr {"a":0,"b":2} vs prev {"a":9,"b":0} -> both keys differ
      assert(rows(0) == """{"a":9,"b":0}""")
      // id=1: curr {"a":1,"b":2} vs prev {"a":9,"b":1}
      assert(rows(1) == """{"a":9,"b":1}""")
      // id=2: prev NULL -> treated as {} -> both curr keys map to null
      assert(rows(2) == """{"a":null,"b":null}""")
      // NullType literal children must also survive forced codegen
      val nulls = spark.sql(
        "SELECT json_merge_patch(NULL, p) AS x FROM (SELECT concat('{\"k\":', CAST(id AS STRING), '}') AS p FROM range(1))")
        .collect().map(_.getString(0))
      assert(nulls(0) == """{"k":0}""")
    }
  }

  // --- direction: changes hold the PRE-update value (README.md:57) ---
  test("changed key maps to the old value") {
    val curr = """{"note":"here is an updated note","id":1}"""
    val prev = """{"note":"here is a sample note","id":1}"""
    assert(MergePatch.createMergePatch(curr, prev) == """{"note":"here is a sample note"}""")
  }
  test("key added in curr maps to null; key only in prev maps to prev value") {
    assert(MergePatch.createMergePatch("""{"a":1,"b":2}""", """{"a":1,"c":3}""")
      == """{"b":null,"c":3}""")
  }
  test("nested objects diff recursively") {
    assert(MergePatch.createMergePatch("""{"o":{"x":1,"y":2}}""", """{"o":{"x":1,"y":3}}""")
      == """{"o":{"y":3}}""")
  }
  test("equal docs -> {} (whitespace-insensitive)") {
    assert(MergePatch.createMergePatch("""{"k": 87}""", """{"k":87}""") == "{}")
  }

  // --- RFC 7386 apply semantics ---
  test("apply: null deletes, object merges, scalar replaces") {
    assert(MergePatch.applyMergePatch("""{"a":1,"b":2}""", """{"a":null,"c":3}""")
      == """{"b":2,"c":3}""")
    assert(MergePatch.applyMergePatch("""{"o":{"x":1}}""", """{"o":{"y":2}}""")
      == """{"o":{"x":1,"y":2}}""")
  }

  // --- property: apply(curr, diff(curr, prev)) == prev for null-free docs ---
  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
    Gen.oneOf("true", "false"))

  private def objGen(depth: Int): Gen[String] = {
    val valueGen = if (depth <= 0) scalarGen else Gen.frequency(
      4 -> scalarGen, 1 -> Gen.lzy(objGen(depth - 1)))
    for {
      n <- Gen.choose(0, 5)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "k"))
      vals <- Gen.listOfN(n, valueGen)
    } yield keys.distinct.zip(vals)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
  }

  test("property: round-trip apply(curr, diff(curr, prev)) == prev") {
    // canonical(prev) = apply prev onto {} (valid because docs are null-free)
    val prop = Prop.forAll(objGen(2), objGen(2)) { (curr: String, prev: String) =>
      val patch = MergePatch.createMergePatch(curr, prev)
      MergePatch.applyMergePatch(curr, patch) == MergePatch.applyMergePatch("{}", prev)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
