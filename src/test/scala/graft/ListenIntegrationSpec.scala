package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{DriverManager, Timestamp}
import java.util.concurrent.{CopyOnWriteArrayList, TimeUnit}

import graft.streaming.{CdcStream, Listen, ListenServer, ListenSink, PqsClient}
import org.apache.spark.sql.functions._

/** The WHOLE daemon composed — the reference's full architecture in one
  * test: database commits → capture source (exactly-once offsets) →
  * stateful prev-image pipeline (op mapping, RFC 7386 changes) → Event
  * JSON → executor-socket ingest → fan-out hub → subscribed client.
  * Reference equivalent: pg_notify → `HandleEvents` → `Listen` RPC →
  * `pqs` stdout (`server.go:258-315`, `cmd/pqs/main.go`).
  */
class ListenIntegrationSpec extends SparkSuite {

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def exec(url: String, sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(sql) finally c.close()
  }

  private def insert(url: String, rows: (Long, Timestamp, Long, String, String)*): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement("INSERT INTO events VALUES (?, ?, ?, ?, ?)")
      rows.foreach { case (id, ts, uid, typ, props) =>
        ps.setLong(1, id); ps.setTimestamp(2, ts); ps.setLong(3, uid)
        ps.setString(4, typ); ps.setString(5, props)
        ps.executeUpdate()
      }
    } finally c.close()
  }

  test("database commit -> CDC capture -> prev-image -> hub -> pqs client, end to end") {
    import spark.implicits._
    val url = "jdbc:derby:memory:listen_e2e;create=true"
    DriverManager.getConnection(url).close()
    exec(url, "CREATE TABLE events (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
      "user_id BIGINT, event_type VARCHAR(32), props VARCHAR(500))")
    insert(url,
      (1L, t(0), 1L, "signup", """{"k":1}"""),
      (2L, t(1), 1L, "purchase", """{"k":2}"""))

    val server = new ListenServer()
    val got = new CopyOnWriteArrayList[String]()
    val client = new Thread(() =>
      try PqsClient.run("127.0.0.1", server.boundPort, "even", got.add(_), maxEvents = 3)
      catch { case _: Throwable => () })
    client.setDaemon(true); client.start()
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
    while (server.subscriberCount < 1 && System.nanoTime() < deadline) Thread.sleep(10)

    val raw = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("jdbcUrl", url).option("jdbcTable", "events")
      .option("numPartitions", "2").load()
    val events = CdcStream.withPrevState(raw.as[CdcStream.RawChange]).toDF()
      .select(lit("events").as("table"),
        Listen.eventJson(lit("public"), lit("events"), col("op"),
          col("event_id"), col("payload"), col("changes")).as("event"))
    val q = events.writeStream.outputMode("append")
      .foreach(ListenSink.writer("127.0.0.1", server.boundPort)).start()
    try {
      q.processAllAvailable()
      // a third commit AFTER the stream is live — the steady-state path
      insert(url, (3L, t(2), 1L, "view", """{"k":5}"""))
      q.processAllAvailable()
      client.join(10000)
      import scala.jdk.CollectionConverters._
      val lines = got.asScala.toList
      assert(lines.size == 3, s"client received: $lines")
      assert(lines.contains(
        """{"schema":"public","table":"events","op":"INSERT","id":"1","payload":{"k":1}}"""))
      // the UPDATE carries the RFC 7386 changes (pre-update value), computed
      // from state that crossed micro-batches for event 3
      assert(lines.exists(l => l.contains("\"id\":\"2\"") &&
        l.contains("\"changes\":{\"k\":1}")), s"update patch missing: $lines")
      assert(lines.exists(l => l.contains("\"id\":\"3\"") &&
        l.contains("\"changes\":{\"k\":2}")), s"cross-batch state patch missing: $lines")
    } finally { q.stop(); server.close() }
  }

  test("continuous trigger end to end: commit -> tail-poll capture -> hub -> client, mid-epoch") {
    import spark.implicits._
    val url = "jdbc:derby:memory:listen_cont_e2e;create=true"
    DriverManager.getConnection(url).close()
    exec(url, "CREATE TABLE events (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
      "user_id BIGINT, event_type VARCHAR(32), props VARCHAR(500))")
    insert(url, (1L, t(0), 1L, "purchase", """{"k":1}"""))

    val server = new ListenServer()
    val got = new CopyOnWriteArrayList[(String, Long)]()
    val client = new Thread(() =>
      try PqsClient.run("127.0.0.1", server.boundPort, ".*",
        l => { got.add(l -> System.nanoTime()); () }, maxEvents = 2)
      catch { case _: Throwable => () })
    client.setDaemon(true); client.start()
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
    while (server.subscriberCount < 1 && System.nanoTime() < deadline) Thread.sleep(10)

    val raw = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("jdbcUrl", url).option("jdbcTable", "events")
      .option("continuousPollMs", "1").load()
    val events = CdcStream.statelessEvents(raw.as[CdcStream.RawChange])
      .select(lit("events").as("table"), col("event"))
    val q = events.writeStream.outputMode("append")
      // per-record flush: batch-grain flushing would hold events until the
      // epoch closes — the continuous composition needs continuousWriter
      .foreach(ListenSink.continuousWriter("127.0.0.1", server.boundPort))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("listen_cont").toString)
      // LONG epoch on purpose: delivery must happen MID-epoch
      .trigger(org.apache.spark.sql.streaming.Trigger.Continuous("30 seconds"))
      .start()
    try {
      val d0 = System.nanoTime() + TimeUnit.SECONDS.toNanos(60)
      while (got.size < 1 && System.nanoTime() < d0) Thread.sleep(5)
      assert(got.size >= 1, "backlog row never reached the client")
      // steady state: a commit AFTER the stream is live, timed
      insert(url, (2L, t(1), 2L, "purchase", """{"k":2}"""))
      val commitNs = System.nanoTime()
      val d1 = System.nanoTime() + TimeUnit.SECONDS.toNanos(25)
      while (got.size < 2 && System.nanoTime() < d1) Thread.sleep(2)
      assert(got.size >= 2, "live commit never reached the client")
      client.join(5000)
      import scala.jdk.CollectionConverters._
      val (line2, arriveNs) = got.asScala.find(_._1.contains("\"id\":\"2\"")).get
      assert(line2.contains(""""op":"UPDATE"""") && line2.contains("""{"k":2}"""), line2)
      // mid-epoch proof: arrival far inside the 30 s epoch, ms-class
      val ms = (arriveNs - commitNs) / 1e6
      assert(ms < 5000, s"commit->client took ${ms}ms — epoch-gated, not continuous")
    } finally { q.stop(); server.close() }
  }

  test("bootstrapAll -> multi-table daemon -> per-table resume: exactly-once per table across a disconnect") {
    import graft.streaming.{CdcCatalog, CdcSource, ListenResume, PqsClient}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val url = "jdbc:derby:memory:listen_bootall;create=true"
    DriverManager.getConnection(url).close()
    def mk(table: String): Unit =
      exec(url, s"CREATE TABLE $table (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
        "user_id BIGINT, event_type VARCHAR(32), props VARCHAR(500))")
    def ins(table: String, ids: Range): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val ps = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?, ?)")
        ids.foreach { i =>
          ps.setLong(1, i.toLong); ps.setTimestamp(2, t(i.toLong))
          ps.setLong(3, i.toLong % 3); ps.setString(4, "INSERT")
          ps.setString(5, s"""{"k":$i}"""); ps.executeUpdate()
        }
      } finally c.close()
    }
    // skewed id spaces — the shape where one shared token either
    // re-delivers the big table's backlog or loses the small table's rows
    mk("orders"); mk("clicks")
    ins("orders", 1 to 4); ins("clicks", 1 to 9)

    val specs = Seq(CdcSource.JdbcSpec(url, "orders"), CdcSource.JdbcSpec(url, "clicks"))
    val (snapshot, tail) = CdcCatalog.bootstrapAll(spark, specs, numPartitions = 2)

    // per-table archives seeded from the bootstrap snapshot — per-table id
    // spaces are independent, so each table gets its own replay store
    def toArchive(df: DataFrame): DataFrame =
      df.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type").as("op"), col("props"))
    val dirs = Map(
      "orders" -> java.nio.file.Files.createTempDirectory("boot_res_orders").toString,
      "clicks" -> java.nio.file.Files.createTempDirectory("boot_res_clicks").toString)
    dirs.foreach { case (tab, d) =>
      graft.sources.Layout.writeEventArchive(
        toArchive(snapshot.filter(col("table") === tab)), d)
    }

    // the client consumed the bootstrap mid-stream and died holding
    // PER-TABLE tokens (orders through 3, clicks through 7); new commits
    // land on both tables while it is gone, and the daemon tail archives
    // each batch per table before anything is published (the at-least-once
    // deployment order)
    val tokens = Map("orders" -> 3L, "clicks" -> 7L)
    ins("orders", 5 to 6); ins("clicks", 10 to 12)
    val server = new ListenServer(replaySourceByTable = Some(
      ListenResume.multiArchiveReplay(spark, dirs)))
    val q = tail.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val rows = b.persist()
        try dirs.foreach { case (tab, d) =>
          graft.sources.Layout.appendArchiveBatch(
            toArchive(rows.filter(col("table") === tab)), d, id)
        } finally rows.unpersist()
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("boot_res_chk").toString)
      .start()
    try {
      q.processAllAvailable()
      // reconnect with the per-table tokens: each table's gap replays
      // above ITS OWN token — exactly once per table, no cross-table bleed
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFromTables("127.0.0.1", server.boundPort, ".*", tokens,
        got.add(_), maxEvents = 8)
      import scala.jdk.CollectionConverters._
      val byTable = got.asScala.toSeq.groupBy(PqsClient.eventTable)
        .view.mapValues(_.map(PqsClient.eventId)).toMap
      assert(byTable.keySet == Set("orders", "clicks"), s"got ${byTable.keySet}")
      assert(byTable("orders") == Seq(4L, 5L, 6L),
        s"orders gap not exactly-once: ${byTable("orders")}")
      assert(byTable("clicks") == Seq(8L, 9L, 10L, 11L, 12L),
        s"clicks gap not exactly-once: ${byTable("clicks")}")
    } finally { q.stop(); server.close() }
  }

  test("bootstrapAll -> multi-archive erasure MID-GAP -> per-table resume: the gap replays minus each table's erased rows") {
    import graft.streaming.{CdcCatalog, CdcSource, EraseEverywhere, ListenResume, PqsClient, StateErasure}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val url = "jdbc:derby:memory:listen_erasegap;create=true"
    DriverManager.getConnection(url).close()
    def mk(table: String): Unit =
      exec(url, s"CREATE TABLE $table (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
        "user_id BIGINT, event_type VARCHAR(32), props VARCHAR(500))")
    def ins(table: String, ids: Range): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val ps = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?, ?)")
        ids.foreach { i =>
          ps.setLong(1, i.toLong); ps.setTimestamp(2, t(i.toLong))
          ps.setLong(3, i.toLong % 3); ps.setString(4, "INSERT")
          ps.setString(5, s"""{"k":$i}"""); ps.executeUpdate()
        }
      } finally c.close()
    }
    // skewed id spaces (orders tops out at 4 while clicks reaches 9 with
    // the same low ids) — the shape where a merged cross-table cutoff
    // either resurrects or blocks; users keyed id % 3
    mk("orders"); mk("clicks")
    ins("orders", 1 to 4); ins("clicks", 1 to 9)

    val specs = Seq(CdcSource.JdbcSpec(url, "orders"), CdcSource.JdbcSpec(url, "clicks"))
    val (snapshot, tail) = CdcCatalog.bootstrapAll(spark, specs, numPartitions = 2)
    def toArchive(df: DataFrame): DataFrame =
      df.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type").as("op"), col("props"))
    val dirs = Map(
      "orders" -> java.nio.file.Files.createTempDirectory("egap_orders").toString,
      "clicks" -> java.nio.file.Files.createTempDirectory("egap_clicks").toString)
    dirs.foreach { case (tab, d) =>
      graft.sources.Layout.writeEventArchive(
        toArchive(snapshot.filter(col("table") === tab)), d)
    }

    // the client died holding per-table tokens; new commits land on both
    // tables while it is gone and the daemon archives them per table
    val tokens = Map("orders" -> 3L, "clicks" -> 7L)
    ins("orders", 5 to 6); ins("clicks", 10 to 12)
    val server = new ListenServer(replaySourceByTable = Some(
      ListenResume.multiArchiveReplay(spark, dirs)))
    val q = tail.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val rows = b.persist()
        try dirs.foreach { case (tab, d) =>
          graft.sources.Layout.appendArchiveBatch(
            toArchive(rows.filter(col("table") === tab)), d, id)
        } finally rows.unpersist()
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("egap_chk").toString)
      .start()
    try {
      q.processAllAvailable()
      // MID-GAP compliance request: user 1 (ids 1,4 in orders; 1,4,7,10 in
      // clicks) erased from BOTH archives in one call, per-table cutoffs
      val (rep, _) = EraseEverywhere.runMultiArchive(spark, dirs, Seq(1L), Seq.empty)
      val r = rep.collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
      assert(r("archive:orders") == (2L, 0L) && r("archive:clicks") == (4L, 0L), s"$r")
      // the cutoffs are each table's OWN archive max — the independent
      // id-space contract the resume must now compose with
      assert(StateErasure.erasureSet(spark, dirs("orders")) == Map(1L -> 6L))
      assert(StateErasure.erasureSet(spark, dirs("clicks")) == Map(1L -> 12L))

      // reconnect: each table's gap replays above ITS token, minus ITS
      // erased rows — orders loses id 4 (user 1), clicks loses id 10 —
      // exactly once, no cross-table bleed
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFromTables("127.0.0.1", server.boundPort, ".*", tokens,
        got.add(_), maxEvents = 6)
      import scala.jdk.CollectionConverters._
      val byTable = got.asScala.toSeq.groupBy(PqsClient.eventTable)
        .view.mapValues(_.map(PqsClient.eventId)).toMap
      assert(byTable.keySet == Set("orders", "clicks"), s"got $byTable")
      assert(byTable("orders") == Seq(5L, 6L),
        s"orders gap must replay minus the erased id 4: ${byTable("orders")}")
      assert(byTable("clicks") == Seq(8L, 9L, 11L, 12L),
        s"clicks gap must replay minus the erased id 10: ${byTable("clicks")}")

      // the entity's FUTURE rows still flow in the low-id table: orders id
      // 7 (user 1) is above orders' cutoff (6) but below clicks' (12) — a
      // merged cutoff would silently drop it at the append guard
      ins("orders", 7 to 7)
      q.processAllAvailable()
      val got2 = new CopyOnWriteArrayList[String]()
      PqsClient.runFromTables("127.0.0.1", server.boundPort, ".*",
        Map("orders" -> 6L, "clicks" -> 12L), got2.add(_), maxEvents = 1)
      val after = got2.asScala.toSeq.map(l => (PqsClient.eventTable(l), PqsClient.eventId(l)))
      assert(after == Seq(("orders", 7L)),
        s"the erased entity's post-request row must flow (per-table cutoff, " +
          s"no cross-table bleed): $after")
    } finally { q.stop(); server.close() }
  }

  test("subscriber churn: a disconnected client unregisters; the hub keeps serving") {
    val server = new ListenServer()
    try {
      val s1 = new Socket("127.0.0.1", server.boundPort)
      val w1 = new BufferedWriter(new OutputStreamWriter(s1.getOutputStream, UTF_8))
      w1.write("{\"tableRegexp\":\".*\"}\n"); w1.flush()
      val lines = new CopyOnWriteArrayList[String]()
      val survivor = new Thread(() =>
        try PqsClient.run("127.0.0.1", server.boundPort, ".*", lines.add(_), maxEvents = 2)
        catch { case _: Throwable => () })
      survivor.setDaemon(true); survivor.start()
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      while (server.subscriberCount < 2 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(server.subscriberCount == 2)

      s1.close() // churn: first client drops without unsubscribing
      server.publish("t", "{\"a\":1}")
      server.publish("t", "{\"a\":2}")
      survivor.join(10000)
      import scala.jdk.CollectionConverters._
      assert(lines.asScala.toList == List("{\"a\":1}", "{\"a\":2}"),
        "survivor must receive everything after the other client dropped")
      // the dead subscriber is eventually reaped (writer thread notices)
      val reapDeadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      while (server.subscriberCount > 0 && System.nanoTime() < reapDeadline) {
        server.publish("t", "{\"probe\":1}") // writes to the dead socket force the error
        Thread.sleep(50)
      }
      assert(server.subscriberCount == 0, "dead subscribers must unregister")
    } finally server.close()
  }
}
