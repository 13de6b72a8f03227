package graft

import graft.streaming.{CdcStream, Monitor}
import graft.streaming.CdcStream.RawChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming observability: progress lands in the ring with the fields a
  * retention decision needs (state rows/bytes), the ring bound holds, and
  * detach stops collection.
  */
class MonitorSpec extends SparkSuite {
  import spark.implicits._

  private def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))

  test("stateful query progress reports batches, rates, and state size; ring stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mon = Monitor.attach(spark, capacity = 2)
    val input = MemoryStream[RawChange]
    val q = CdcStream.withPrevState(input.toDS())
      .writeStream.format("memory").queryName("monitor_probe")
      .outputMode("append").start()
    try {
      (0 until 4).foreach { b =>
        input.addData(RawChange(b.toLong, t(b), 1L, "purchase", s"""{"k":$b}"""))
        q.processAllAvailable()
      }
      // listener delivery is async — wait for the ring to see progress
      val deadline = System.nanoTime() + 10L * 1000000000L
      def snap() = mon.snapshot(spark).filter("query = 'monitor_probe'").collect()
      while (snap().length < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      val rows = snap()
      // ring bound: 4 batches ran, at most 2 retained (shared with any
      // concurrent suite queries, hence the query-name filter + <=)
      assert(rows.nonEmpty && rows.length <= 2, s"ring bound broken: ${rows.length}")
      val r = rows.maxBy(_.getAs[Long]("batchId"))
      assert(r.getAs[Long]("numInputRows") == 1L)
      assert(r.getAs[Long]("triggerMs") >= 0L, "trigger duration missing")
      // the retention-decision fields: the prev-image query holds ONE key
      assert(r.getAs[Long]("stateRows") == 1L,
        s"state rows should be 1 (one user key): $r")
      assert(r.getAs[Long]("stateBytes") > 0L, "state bytes not reported")
    } finally {
      q.stop()
      Monitor.detach(spark, mon)
    }
  }

  test("sinked telemetry survives the session: flush on detach, read back fresh") {
    implicit val sqlCtx = spark.sqlContext
    val sinkDir = java.nio.file.Files.createTempDirectory("monitor_sink").toString + "/ring"
    // flushEvery larger than the batch count: proves the DETACH flush path
    // (the threshold path is the same write, just earlier)
    val mon = Monitor.attach(spark, capacity = 8, sink = Some(sinkDir), flushEvery = 256)
    val input = MemoryStream[RawChange]
    val q = CdcStream.withPrevState(input.toDS())
      .writeStream.format("memory").queryName("monitor_sinked")
      .outputMode("append").start()
    try {
      (0 until 3).foreach { b =>
        input.addData(RawChange(b.toLong, t(b), 1L, "purchase", s"""{"k":$b}"""))
        q.processAllAvailable()
      }
      // wait out the async listener bus before detaching
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (mon.snapshot(spark).filter("query = 'monitor_sinked'").count() < 3 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    } finally {
      q.stop()
      Monitor.detach(spark, mon) // flushes the spool
    }
    // read back through a FRESH session state — the post-mortem path: the
    // parquet outlives the listener, the ring, and the session that wrote it
    val back = spark.newSession().read.parquet(sinkDir)
      .filter("query = 'monitor_sinked'")
    assert(back.count() >= 3, s"persisted ring short: ${back.count()}")
    val r = back.orderBy(org.apache.spark.sql.functions.desc("batchId")).head()
    assert(r.getAs[Long]("stateRows") == 1L, s"state fields lost in the sink: $r")
    assert(r.getAs[Long]("stateBytes") > 0L)
  }

  test("detach stops collection") {
    implicit val sqlCtx = spark.sqlContext
    val mon = Monitor.attach(spark)
    Monitor.detach(spark, mon)
    val input = MemoryStream[RawChange]
    val q = input.toDS().toDF()
      .writeStream.format("memory").queryName("monitor_detached")
      .outputMode("append").start()
    try {
      input.addData(RawChange(1L, t(0), 1L, "signup", "{}"))
      q.processAllAvailable()
      Thread.sleep(200) // grace for any stray async delivery
      assert(mon.snapshot(spark).filter("query = 'monitor_detached'").count() == 0)
    } finally q.stop()
  }

  test("self-monitoring: a latency regression pages; bounded telemetry doesn't") {
    // the auto-calibrated CUSUM over synthetic telemetry — the exact
    // host-drift signature the r9 closing bench caught BY HAND: trigger
    // time drifts up 30 batches in, state stays flat
    val rows =
      (0L until 30L).map(b => ("q1", "r", b, "", 1L, 0.0, 0.0, 100L + (b % 5), 10L, 4096L)) ++
      (30L until 40L).map(b => ("q1", "r", b, "", 1L, 0.0, 0.0, 1100L + (b % 5), 10L, 4096L))
    val df = rows.toDF("query", "runId", "batchId", "timestamp", "numInputRows",
      "inputRowsPerSec", "processedRowsPerSec", "triggerMs", "stateRows", "stateBytes")
    val alerts = Monitor.healthAlerts(df).collect()
    assert(alerts.exists(a => a.group == "q1|trigger_ms" && a.side == 1 && a.seq >= 30L),
      s"latency regression must page: ${alerts.toSeq}")
    assert(!alerts.exists(a => a.group == "q1|trigger_ms" && a.seq < 30L),
      s"paged before the regression: ${alerts.toSeq}")
    assert(!alerts.exists(_.group == "q1|state_bytes"),
      s"flat state series paged: ${alerts.toSeq}")
  }

  test("self-monitoring end to end: injected slowdown pages from the query's own telemetry") {
    implicit val sqlCtx = spark.sqlContext
    val mon = Monitor.attach(spark, capacity = 128)
    val in = MemoryStream[Long]
    // rows >= the marker sleep inside the task — a real per-batch slowdown
    // visible only through the engine's own progress telemetry
    val marker = 1000000L
    val q = in.toDS().map { x => if (x >= marker) Thread.sleep(1000); x }
      .writeStream.format("memory").queryName("health_probe")
      .outputMode("append").start()
    try {
      (0 until 25).foreach { i => in.addData(i.toLong); q.processAllAvailable() }
      (0 until 6).foreach { i => in.addData(marker + i); q.processAllAvailable() }
      // listener delivery is async — wait for all 31 batches to land
      val deadline = System.nanoTime() + 15L * 1000000000L
      def n() = mon.snapshot(spark).filter("query = 'health_probe'").count()
      while (n() < 31 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(n() >= 31, s"telemetry incomplete: ${n()} of 31 batches")
      val alerts = Monitor.healthAlerts(mon, spark).collect()
        .filter(_.group == "health_probe|trigger_ms")
      assert(alerts.exists(a => a.side == 1 && a.seq >= 25L),
        s"injected slowdown must page from own telemetry: ${alerts.toSeq}")
    } finally {
      q.stop()
      Monitor.detach(spark, mon)
    }
  }
}
