package graft

import graft.streaming.SchemaDrift
import graft.streaming.SchemaDrift.{KeyAlert, KeyRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online schema-drift alerts: replay parity against the batch first-seen
  * query, exactly-once alerting across micro-batches, and the TTL
  * re-alert trade.
  */
class SchemaDriftSpec extends SparkSuite {
  import spark.implicits._

  private def docCol = concat(
    lit("{\"k\":"), get_json_object(col("props"), "$.k"),
    when(col("event_type") === "purchase", lit(",\"amount\":1")).otherwise(lit("")),
    when(col("event_type") === "error", lit(",\"code\":1")).otherwise(lit("")),
    when(col("event_type") === "signup", lit(",\"plan\":\"p\"")).otherwise(lit("")),
    lit("}"))

  test("replay parity: streaming alert set equals the batch first-seen query") {
    implicit val sqlCtx = spark.sqlContext
    // the REAL fixture events, replayed id-ordered in two waves through
    // the same doc synthesis the batch query uses
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type").as("group"), col("event_id"), docCol.as("doc"))
      .orderBy("event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val (w1, w2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[(String, Long, String)]
    val q = SchemaDrift.alerts(
        SchemaDrift.keyRows(in.toDS().toDF("group", "event_id", "doc")))
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    val got = try {
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(w2.toIndexedSeq); q.processAllAvailable()
      spark.table("drift_out").as[KeyAlert].collect().toSet
    } finally q.stop()
    val want = SparkEntry.queries("cdc_key_first_seen")(spark, sf)
      .select(col("event_type"), col("key"), col("first_event_id"))
      .collect().map(r => KeyAlert(r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == want,
      s"drift alerts diverged: missing ${want -- got}, phantom ${got -- want}")
  }

  test("type drift: (key, vtype) alerts replay-equal to the batch first-seen; a flip alerts") {
    implicit val sqlCtx = spark.sqlContext
    // the batch census's synthesized heterogeneous docs, replayed
    val k = get_json_object(col("props"), "$.k")
    val m = col("event_id") % 6
    val vJson = when(m === 0, k)
      .when(m === 1, concat(lit("\""), k, lit("\"")))
      .when(m === 2, lit("true"))
      .when(m === 3, concat(lit("{\"n\":"), k, lit("}")))
      .when(m === 4, concat(lit("["), k, lit("]")))
      .otherwise(lit("null"))
    val docs = Tables.load(spark, sf, "events")
      .select(lit("events").as("group"), col("event_id"),
        concat(lit("{\"k\":"), k, lit(",\"v\":"), vJson, lit("}")).as("doc"))
      .orderBy("event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val (w1, w2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(String, Long, String)]
    val q = SchemaDrift.alerts(
        SchemaDrift.typeRows(in.toDS().toDF("group", "event_id", "doc")))
      .writeStream.format("memory").queryName("tdrift_out")
      .outputMode("append").start()
    val got = try {
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(w2.toIndexedSeq); q.processAllAvailable()
      spark.table("tdrift_out").as[KeyAlert].collect().toSet
    } finally q.stop()
    val want = SparkEntry.queries("cdc_type_first_seen")(spark, sf)
      .collect().map(r => KeyAlert("events",
        s"${r.getString(0)}:${r.getString(1)}", r.getLong(2))).toSet
    assert(got == want,
      s"type alerts diverged: missing ${want -- got}, phantom ${got -- want}")
    // and the canonical drift event — an old key flipping type — alerts
    val in2 = MemoryStream[(String, Long, String)]
    val q2 = SchemaDrift.alerts(
        SchemaDrift.typeRows(in2.toDS().toDF("group", "event_id", "doc")))
      .writeStream.format("memory").queryName("tdrift_flip")
      .outputMode("append").start()
    try {
      in2.addData(("t", 1L, """{"amount":5}"""), ("t", 2L, """{"amount":7}"""))
      q2.processAllAvailable()
      in2.addData(("t", 3L, """{"amount":"7.50"}""")) // the poison flip
      q2.processAllAvailable()
      val rows = spark.table("tdrift_flip").as[KeyAlert].collect().toSet
      assert(rows == Set(KeyAlert("t", "amount:number", 1L),
        KeyAlert("t", "amount:string", 3L)), s"got $rows")
    } finally q2.stop()
  }

  test("a key alerts exactly once; a novel mid-stream key alerts on arrival") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val q = SchemaDrift.alerts(
        SchemaDrift.keyRows(in.toDS().toDF("group", "event_id", "doc")))
      .writeStream.format("memory").queryName("drift_once")
      .outputMode("append").start()
    try {
      in.addData(("t", 1L, """{"a":1}"""), ("t", 2L, """{"a":2}"""))
      q.processAllAvailable()
      in.addData(("t", 3L, """{"a":3}""")) // known key, new batch
      q.processAllAvailable()
      in.addData(("t", 4L, """{"a":4,"b":true}""")) // producer drifted
      q.processAllAvailable()
      val rows = spark.table("drift_once").as[KeyAlert].collect().toSeq
      assert(rows.toSet == Set(KeyAlert("t", "a", 1L), KeyAlert("t", "b", 4L)),
        s"got $rows")
      assert(rows.length == 2, s"re-alerted: $rows")
    } finally q.stop()
  }

  test("groups are independent; within-batch first id is the minimum") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val q = SchemaDrift.alerts(
        SchemaDrift.keyRows(in.toDS().toDF("group", "event_id", "doc")))
      .writeStream.format("memory").queryName("drift_groups")
      .outputMode("append").start()
    try {
      // same key name in two groups = two independent alerts; id 7 and 5
      // carry the key in one batch — the alert must carry 5
      in.addData(("t1", 7L, """{"x":1}"""), ("t1", 5L, """{"x":1}"""),
        ("t2", 9L, """{"x":1}"""))
      q.processAllAvailable()
      val rows = spark.table("drift_groups").as[KeyAlert].collect().toSet
      assert(rows == Set(KeyAlert("t1", "x", 5L), KeyAlert("t2", "x", 9L)),
        s"got $rows")
    } finally q.stop()
  }
}
