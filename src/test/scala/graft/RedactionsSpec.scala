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
}
