package graft

import graft.cdc.Tiering
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the operator kernels whose correctness the
  * DuckDB oracle only samples: the tiering ladder (every size combination,
  * not just the boundary sweep the reference tests — `server_test.go:189-222`)
  * and in-bucket pair generation (vs. a brute-force spec).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("tiering ladder: invariants hold for ALL size combinations") {
    val sizes = Gen.choose(0, 40)
    check(Prop.forAll(sizes, sizes, Gen.choose(1, 120), Gen.choose(0, 50)) { (np, nv, limit, ne) =>
      val df = Seq(("x" * np, "y" * nv)).toDF("payload", "previous")
      val r = Tiering.ladder(df, "payload", "previous", limit,
        envelope = lit("e" * ne)).collect()(0)
      val tier = r.getAs[Int]("tier")
      val pay = Option(r.getAs[String]("payload"))
      val prev = Option(r.getAs[String]("previous"))
      // full-notification splice model: envelope + ,"payload": (11) +
      // ,"previous": (12); both documents are non-null strings here
      val full = ne + 11 + np + 12 + nv
      val noPrev = ne + 11 + np
      // tier matches the ladder arithmetic (>= semantics, queries.go:33)
      (tier == (if (full < limit) 0 else if (noPrev < limit) 1 else 2)) &&
      // previous is dropped before payload, never the reverse
      (!pay.isEmpty || prev.isEmpty) &&
      // tier 0 passes both through byte-identical
      ((tier != 0) || (pay.contains("x" * np) && prev.contains("y" * nv))) &&
      // tier 1 keeps exactly the payload
      ((tier != 1) || (pay.contains("x" * np) && prev.isEmpty)) &&
      // tier 2 is id-only
      ((tier != 2) || (pay.isEmpty && prev.isEmpty))
    })
  }

  test("pairsOf: emits exactly the ordered unique pairs of a sorted id list") {
    val ids = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 50L)))
    check(Prop.forAll(ids) { raw =>
      val sorted = raw.distinct.sorted
      val df = Seq(Tuple1(sorted)).toDF("ids")
      val got = df.select(explode(Dedup.pairsOf(col("ids"))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        a <- sorted; b <- sorted if a < b
      } yield (a, b)).toSet
      got == want
    })
  }

  test("cappedPairs: all pairs within the cap; star (hub + connectivity) beyond it") {
    val ids = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 50L)))
    val caps = Gen.chooseNum(2, 8)
    check(Prop.forAll(ids, caps) { (raw, cap) =>
      val sorted = raw.distinct.sorted
      sorted.length < 2 || {
        val df = Seq(Tuple1(sorted)).toDF("ids")
        val got = df.select(explode(Dedup.cappedPairs(col("ids"), cap)).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        if (sorted.length <= cap) {
          // identical to pairsOf
          got == (for { a <- sorted; b <- sorted if a < b } yield (a, b)).toSet
        } else {
          // star: O(c) pairs, every member connected to the hub
          got == sorted.tail.map(b => (sorted.head, b)).toSet
        }
      }
    })
  }

  test("isSafeIdent: accepts exactly dot-joined ASCII identifier segments") {
    import graft.streaming.JdbcFeed.isSafeIdent
    assert(isSafeIdent("events") && isSafeIdent("app.events") && isSafeIdent("_x.y_2"))
    for (bad <- Seq("", ".", "a.", ".a", "a..b", "a b", "a;b", "a'b", "1abc", "a.1b", "evénts"))
      assert(!isSafeIdent(bad), s"must reject '$bad'")
  }
}
