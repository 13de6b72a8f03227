package graft

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CopyOnWriteArrayList, TimeUnit}

import graft.streaming.{Listen, ListenServer, ListenSink, PqsClient}
import graft.streaming.CdcStream.RawChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Push transport vs the reference's `Listen` RPC semantics
  * (`server.go:284-315`): per-subscription regexp filtering (unanchored, RE2
  * MatchString), invalid-regexp error return, at-most-once drop-on-slow, and
  * the jsonpb `Event` wire shape with omitted absent fields.
  */
class ListenSpec extends SparkSuite {

  /** Subscriber harness: connects, sends the ListenRequest, collects lines. */
  private final class Sub(port: Int, re: String) extends AutoCloseable {
    val socket = new Socket("127.0.0.1", port)
    val lines = new CopyOnWriteArrayList[String]()
    private val w = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
    w.write(s"""{"tableRegexp":${ujsonQuote(re)}}""" + "\n"); w.flush()
    private val reader = new Thread(() => {
      try {
        val in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
        var line = in.readLine()
        while (line != null) { lines.add(line); line = in.readLine() }
      } catch { case _: Throwable => () }
    })
    reader.setDaemon(true); reader.start()
    def await(n: Int, ms: Long = 5000): Unit = {
      val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(ms)
      while (lines.size < n && System.nanoTime() < deadline) Thread.sleep(10)
    }
    override def close(): Unit = socket.close()
  }

  private def ujsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def awaitSubs(server: ListenServer, n: Int, ms: Long = 5000): Unit = {
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(ms)
    while (server.subscriberCount < n && System.nanoTime() < deadline) Thread.sleep(10)
    assert(server.subscriberCount >= n, s"subscribers never registered (want $n)")
  }

  test("per-subscription regexp fan-out, unanchored match, in-order delivery") {
    val server = new ListenServer()
    try {
      val all = new Sub(server.boundPort, ".*")
      val ord = new Sub(server.boundPort, "rder") // unanchored substring, like RE2 MatchString
      try {
        awaitSubs(server, 2)
        server.publish("orders", """{"table":"orders","id":"1"}""")
        server.publish("users", """{"table":"users","id":"2"}""")
        server.publish("orders", """{"table":"orders","id":"3"}""")
        all.await(3); ord.await(2)
        assert(all.lines.size == 3)
        assert(ord.lines.size == 2)
        import scala.jdk.CollectionConverters._
        assert(ord.lines.asScala.toList == List(
          """{"table":"orders","id":"1"}""", """{"table":"orders","id":"3"}"""))
      } finally { all.close(); ord.close() }
    } finally server.close()
  }

  test("invalid regexp answers an error line and closes — the RPC error return") {
    val server = new ListenServer()
    try {
      val bad = new Sub(server.boundPort, "(unclosed")
      try {
        bad.await(1)
        assert(bad.lines.size == 1 && bad.lines.get(0).startsWith("{\"error\":"))
        // connection is closed server-side: no registration happened
        assert(server.subscriberCount == 0)
      } finally bad.close()
    } finally server.close()
  }

  test("slow subscriber drops (at-most-once), fast subscribers unaffected") {
    val server = new ListenServer(queueCapacity = 4)
    try {
      // a subscriber that never reads: its socket buffer + 4-slot queue fill up
      val slow = new Socket("127.0.0.1", server.boundPort)
      val sw = new BufferedWriter(new OutputStreamWriter(slow.getOutputStream, UTF_8))
      sw.write("{\"tableRegexp\":\".*\"}\n"); sw.flush()
      awaitSubs(server, 1)
      // stall its writer thread by closing the input abruptly? No — just
      // flood UNTIL a drop lands: the writer drains to the OS socket buffer,
      // whose size varies with kernel autotuning and box load (a fixed
      // 64-message burst intermittently fit entirely), but the buffer is
      // finite — continuous publishing must eventually block the writer,
      // fill the 4-slot queue, and drop.
      val payload = "x" * 65536
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      var i = 0
      while (server.droppedCount == 0 && System.nanoTime() < deadline) {
        i += 1
        server.publish("t", s"""{"i":$i,"pad":"$payload""" + "\"}")
      }
      assert(server.droppedCount > 0, "flooded non-reading subscriber never dropped")
      slow.close()
    } finally server.close()
  }

  test("drop-oldest subscriber keeps the freshest events under overflow; default drops them") {
    val server = new ListenServer(queueCapacity = 4)
    try {
      def slowSub(handshake: String): (Socket, BufferedReader) = {
        val s = new Socket("127.0.0.1", server.boundPort)
        val w = new BufferedWriter(new OutputStreamWriter(s.getOutputStream, UTF_8))
        w.write(handshake + "\n"); w.flush()
        (s, new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8)))
      }
      // neither client reads during the flood: both writer threads wedge in
      // a blocked socket write, both 4-slot queues overflow — the only
      // difference is the overflow POLICY
      val (defSock, defIn) = slowSub("""{"tableRegexp":".*"}""")
      val (oldSock, oldIn) = slowSub("""{"tableRegexp":".*","policy":"drop-oldest","buffer":4}""")
      awaitSubs(server, 2)
      val payload = "x" * 65536
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(15)
      var i = 0
      def drops = server.dropsByPolicy.withDefaultValue(0L)
      while ((drops("drop-newest") < 50 || drops("drop-oldest") < 50) &&
             System.nanoTime() < deadline) {
        i += 1
        server.publish("t", s"""{"i":$i,"pad":"$payload""" + "\"}")
      }
      // precondition, not contract: on a heavily-loaded box the flood may
      // not saturate kernel buffers in time — cancel rather than fail
      assume(drops("drop-newest") >= 50 && drops("drop-oldest") >= 50,
        "queues never overflowed")
      // four tagged events into the saturated hub: the drop-oldest queue
      // evicts stale entries to admit them — GUARANTEED delivery of the
      // freshest; the default queue admits them only if its wedged writer
      // happened to free slots (usually it didn't)
      (1 to 4).foreach(k => server.publish("t", s"""{"tag":$k}"""))
      def drain(sock: Socket, in: BufferedReader): List[String] = {
        sock.setSoTimeout(5000)
        val buf = List.newBuilder[String]
        try { var l = in.readLine(); while (l != null) { buf += l; l = in.readLine() } }
        catch { case _: Throwable => () }
        buf.result()
      }
      val oldLines = drain(oldSock, oldIn)
      val defLines = drain(defSock, defIn)
      val tags = (1 to 4).map(k => s"""{"tag":$k}""")
      // freshest-events contract: all four tags delivered, the newest last
      assert(tags.forall(oldLines.contains),
        s"drop-oldest lost fresh events: ${oldLines.takeRight(6)}")
      assert(oldLines.last == tags.last,
        s"drop-oldest tail is stale: ${oldLines.last}")
      // reference default: overflow LOSES the new event — per-subscriber
      // drop accounting proves this subscriber personally rejected ≥50
      // fresh arrivals (how many tags slip into late-freed slots is a
      // kernel-buffer race; the LOSS is the deterministic contract), and
      // no eviction means delivery order is exactly admission order
      assert(drops("drop-newest") >= 50,
        s"default subscriber never dropped: ${server.dropsByPolicy}")
      val stale = defLines.filterNot(tags.contains).map(l =>
        l.substring(l.indexOf(":") + 1, l.indexOf(",")).toLong)
      assert(stale == stale.sorted,
        s"default policy reordered admitted events: ${stale.take(10)}")
      defSock.close(); oldSock.close()
    } finally server.close()
  }

  test("binary subscriber: varint-framed pqs.Event protobuf over the same hub") {
    val server = new ListenServer()
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
      w.write("""{"tableRegexp":"events","format":"proto"}""" + "\n"); w.flush()
      awaitSubs(server, 1)
      server.publish("events",
        """{"schema":"public","table":"events","op":"UPDATE","id":"42",""" +
          """"payload":{"k":2,"tag":"café"},"changes":{"k":1}}""")
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      sock.setSoTimeout(5000)
      def varint(): Int = {
        var shift = 0; var v = 0
        while (true) {
          val x = in.read(); assert(x >= 0, "stream closed mid-varint")
          v |= (x & 0x7F) << shift
          if ((x & 0x80) == 0) return v
          shift += 7
        }
        v
      }
      val frame = new Array[Byte](varint())
      var off = 0
      while (off < frame.length) {
        val n = in.read(frame, off, frame.length - off)
        assert(n > 0, "stream closed mid-frame"); off += n
      }
      val ev = graft.streaming.ProtoWire.decodeEvent(frame)
      assert(ev.schema == "public" && ev.table == "events" &&
        ev.op == "UPDATE" && ev.id == "42")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      assert(om.readTree(ev.payload).get("k").asDouble() == 2.0)
      assert(om.readTree(ev.payload).get("tag").asText() == "café")
      assert(om.readTree(ev.changes).get("k").asDouble() == 1.0)
      sock.close()
    } finally server.close()
  }

  test("eventJson matches the jsonpb Event shape; absent fields omitted") {
    import spark.implicits._
    val df = Seq(
      ("public", "events", "UPDATE", 7L, """{"k":2}""", """{"k":1}"""),
      ("public", "events", "INSERT", 8L, """{"k":3}""", null.asInstanceOf[String]),
      ("public", "events", "DELETE", 9L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("schema", "table", "op", "id", "payload", "changes")
    val out = df.select(Listen.eventJson(col("schema"), col("table"), col("op"),
      col("id"), col("payload"), col("changes")).as("j")).as[String].collect()
    assert(out(0) ==
      """{"schema":"public","table":"events","op":"UPDATE","id":"7","payload":{"k":2},"changes":{"k":1}}""")
    assert(out(1) == """{"schema":"public","table":"events","op":"INSERT","id":"8","payload":{"k":3}}""")
    assert(out(2) == """{"schema":"public","table":"events","op":"DELETE","id":"9"}""")
  }

  test("eventJson escapes hostile envelope strings — wire stays parseable JSON") {
    import spark.implicits._
    // a quoted-identifier table name ("a\"b" is legal in Postgres), plus a
    // backslash and a newline — jsonpb escapes all of these unconditionally;
    // the newline would otherwise also break the '\n'-delimited framing
    val df = Seq(("pub\"lic", "ta\"ble\\x", "UP\nDATE", 7L,
      """{"k":2}""", null.asInstanceOf[String]))
      .toDF("schema", "table", "op", "id", "payload", "changes")
    val out = df.select(Listen.eventJson(col("schema"), col("table"), col("op"),
      col("id"), col("payload"), col("changes")).as("j")).as[String].collect()(0)
    assert(!out.contains("\n"), s"framing must survive: $out")
    // parse it back with Spark's own JSON reader — four intact fields
    val parsed = Seq(out).toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "schema STRING, table STRING, op STRING, id STRING")).as("e"))
      .select(col("e.schema"), col("e.table"), col("e.op"), col("e.id"))
      .as[(String, String, String, String)].collect()(0)
    assert(parsed == (("pub\"lic", "ta\"ble\\x", "UP\nDATE", "7")), s"got $parsed from $out")
  }

  test("end-to-end: streaming query -> executor ingest sockets -> hub -> pqs client") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val server = new ListenServer()
    val q = {
      val input = MemoryStream[RawChange]
      input.addData(
        RawChange(1, new java.sql.Timestamp(0), 1, "signup", """{"k":1}"""),
        RawChange(2, new java.sql.Timestamp(1), 2, "purchase", """{"k":2}"""),
        RawChange(3, new java.sql.Timestamp(2), 3, "error", """{"k":3}"""))
      val events = input.toDS().toDF()
        .select(lit("events").as("table"),
          Listen.eventJson(lit("public"), lit("events"),
            graft.cdc.EventLog.opCol, col("event_id"), col("props"), lit(null).cast("string"))
            .as("event"))
      events.writeStream.outputMode("append").foreach(ListenSink.writer("127.0.0.1", server.boundPort)).start()
    }
    try {
      // pqs-client analog: subscribe before draining the stream
      val got = new CopyOnWriteArrayList[String]()
      val client = new Thread(() =>
        try PqsClient.run("127.0.0.1", server.boundPort, "even", got.add(_), maxEvents = 3)
        catch { case _: Throwable => () })
      client.setDaemon(true); client.start()
      awaitSubs(server, 1)
      q.processAllAvailable()
      client.join(10000)
      import scala.jdk.CollectionConverters._
      val lines = got.asScala.toList
      assert(lines.size == 3, s"client got: $lines")
      assert(lines.contains(
        """{"schema":"public","table":"events","op":"INSERT","id":"1","payload":{"k":1}}"""))
      assert(lines.exists(l => l.contains("\"op\":\"UPDATE\"") && l.contains("\"id\":\"2\"")))
    } finally { q.stop(); server.close() }
  }

  test("resumable subscriber: kill mid-stream, reconnect with token, at-least-once") {
    import graft.streaming.ListenResume
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    val dir = java.nio.file.Files.createTempDirectory("listen_resume").toString
    def batch(ids: Range) = ids.map(i =>
      (i.toLong, t(i), i.toLong % 3, "INSERT", s"""{"k":$i}"""))
      .toDF("event_id", "ts", "user_id", "op", "props")
    // the deployment order the at-least-once contract needs: archive THE
    // BATCH first, publish after (every published event is already durable)
    val server = new ListenServer(
      replaySource = Some(ListenResume.archiveReplay(spark, dir)))
    def archiveThenPublish(ids: Range, batchId: Long): Unit = {
      assert(graft.sources.Layout.appendArchiveBatch(batch(ids), dir, batchId))
      ids.foreach(i => server.publish("events",
        s"""{"schema":"public","table":"events","op":"INSERT","id":"$i","payload":{"k":$i}}"""))
    }
    try {
      // wave 1: a live subscriber takes the first 10 events then dies
      val got1 = new CopyOnWriteArrayList[String]()
      val c1 = new Thread(() => PqsClient.run("127.0.0.1", server.boundPort, "events",
        got1.add(_), maxEvents = 10))
      c1.setDaemon(true); c1.start()
      awaitSubs(server, 1)
      archiveThenPublish(0 until 20, 0L)
      c1.join(10000)
      assert(got1.size == 10, s"control subscriber got ${got1.size}")
      val token = got1.toArray(Array.empty[String]).map(PqsClient.eventId).max
      assert(token == 9L, s"token $token")
      // the gap widens while the subscriber is gone
      archiveThenPublish(20 until 40, 1L)

      // reconnect with the token: the archive gap (10..39) replays first,
      // then live events (40..49) flow — every event after the token is
      // delivered at least once
      val got2 = new CopyOnWriteArrayList[String]()
      @volatile var done = false
      val c2 = new Thread(() => {
        PqsClient.runFrom("127.0.0.1", server.boundPort, "events", token,
          got2.add(_), maxEvents = 40)
        done = true
      })
      c2.setDaemon(true); c2.start()
      // wait until the replay has caught up to the archive tail before
      // publishing wave 3, so its delivery path (live queue) is deterministic
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(15)
      while (!Option(got2.toArray(Array.empty[String]))
               .exists(_.exists(l => PqsClient.eventId(l) == 39L)) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      archiveThenPublish(40 until 50, 2L)
      c2.join(15000)
      assert(done, s"resumed subscriber stalled at ${got2.size} events")
      val ids = got2.toArray(Array.empty[String]).map(PqsClient.eventId).toSeq
      assert(ids.toSet == (10L until 50L).toSet,
        s"gap not covered: missing ${(10L until 50L).toSet -- ids.toSet}")
      assert(ids.size == 40, s"unexpected duplication in this sequencing: ${ids.size}")
      // replayed segment arrives in id order (archive scan is ordered)
      assert(ids.take(30) == (10L until 40L).toSeq, "replay out of order")
    } finally server.close()
  }

  test("3-field ingest forwards the pre-encoded frame: proto subs get it verbatim, JSON subs the line") {
    import graft.streaming.ProtoWire
    val server = new ListenServer()
    try {
      val json = """{"schema":"public","table":"events","op":"INSERT","id":"5","payload":{"k":5}}"""
      val frame = ProtoWire.framedEventBase64(json)
      // one JSON subscriber, one proto subscriber
      val jsonSub = new Sub(server.boundPort, ".*")
      val protoGot = new CopyOnWriteArrayList[Array[Byte]]()
      val protoSock = new Socket("127.0.0.1", server.boundPort)
      val pw = new BufferedWriter(new OutputStreamWriter(protoSock.getOutputStream, UTF_8))
      pw.write("""{"tableRegexp":".*","format":"proto"}""" + "\n"); pw.flush()
      val protoReader = new Thread(() => {
        try {
          val in = new java.io.BufferedInputStream(protoSock.getInputStream)
          var shift = 0; var len = 0; var more = true
          while (more) {
            val x = in.read()
            len |= (x & 0x7F) << shift
            if ((x & 0x80) == 0) more = false else shift += 7
          }
          protoGot.add(in.readNBytes(len))
        } catch { case _: Throwable => () }
      })
      protoReader.setDaemon(true); protoReader.start()
      awaitSubs(server, 2)
      // ingest with the optional third field
      val ing = new Socket("127.0.0.1", server.boundPort)
      val iw = new BufferedWriter(new OutputStreamWriter(ing.getOutputStream, UTF_8))
      iw.write("{\"ingest\":true}\n")
      iw.write(s"events\t$json\t$frame\n"); iw.flush()
      jsonSub.await(1); protoReader.join(5000)
      assert(jsonSub.lines.size == 1 && jsonSub.lines.get(0) == json)
      assert(protoGot.size == 1, "proto subscriber got no frame")
      val ev = ProtoWire.decodeEvent(protoGot.get(0))
      assert(ev.table == "events" && ev.op == "INSERT" && ev.id == "5")
      ing.close(); jsonSub.close(); protoSock.close()
    } finally server.close()
  }

  test("proto subscriber resume: the archive gap replays as decodable frames, then live frames follow") {
    import graft.streaming.{ListenResume, ProtoWire}
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    val dir = java.nio.file.Files.createTempDirectory("listen_resume_proto").toString
    val rows = (0 until 6).map(i =>
      (i.toLong, t(i), i.toLong, "INSERT", s"""{"k":$i}"""))
      .toDF("event_id", "ts", "user_id", "op", "props")
    graft.sources.Layout.writeEventArchive(rows, dir)
    val server = new ListenServer(
      replaySource = Some(ListenResume.archiveReplay(spark, dir)))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
      w.write("""{"tableRegexp":".*","format":"proto","resumeAfter":"2"}""" + "\n")
      w.flush()
      val got = new CopyOnWriteArrayList[ProtoWire.Event]()
      val reader = new Thread(() => {
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          while (got.size < 4) {
            var shift = 0; var len = 0; var more = true
            while (more) {
              val x = in.read()
              len |= (x & 0x7F) << shift
              if ((x & 0x80) == 0) more = false else shift += 7
            }
            got.add(ProtoWire.decodeEvent(in.readNBytes(len)))
          }
        } catch { case _: Throwable => () }
      })
      reader.setDaemon(true); reader.start()
      awaitSubs(server, 1)
      // publish one live event once the replay has had time to register;
      // the reader expects 3 replayed (ids 3,4,5) + 1 live
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      while (got.size < 3 && System.nanoTime() < deadline) Thread.sleep(20)
      server.publish("events",
        """{"schema":"public","table":"events","op":"INSERT","id":"6","payload":{"k":6}}""")
      reader.join(10000)
      val ids = got.toArray(Array.empty[ProtoWire.Event]).map(_.id).toSeq
      assert(ids == Seq("3", "4", "5", "6"), s"proto resume stream wrong: $ids")
      assert(got.get(0).op == "INSERT" && got.get(0).table == "events")
      sock.close()
    } finally server.close()
  }

  test("resume honors the subscription regexp: a narrow subscriber gets none of the archive tail") {
    import graft.streaming.ListenResume
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    val dir = java.nio.file.Files.createTempDirectory("listen_resume_narrow").toString
    val rows = (0 until 5).map(i =>
      (i.toLong, t(i), i.toLong, "INSERT", s"""{"k":$i}"""))
      .toDF("event_id", "ts", "user_id", "op", "props")
    graft.sources.Layout.writeEventArchive(rows, dir)
    val server = new ListenServer(
      replaySource = Some(ListenResume.archiveReplay(spark, dir)))
    try {
      val got = new CopyOnWriteArrayList[String]()
      val c = new Thread(() => PqsClient.runFrom("127.0.0.1", server.boundPort,
        "^other$", -1L, got.add(_), maxEvents = 1))
      c.setDaemon(true); c.start()
      awaitSubs(server, 1)
      // give the replay a moment; all archived rows are table "events",
      // which the narrow regexp must filter — the FIRST line the client
      // sees must be the live "other" event
      Thread.sleep(500)
      server.publish("other", """{"table":"other","id":"99"}""")
      c.join(10000)
      val lines = got.toArray(Array.empty[String]).toSeq
      assert(lines.size == 1 && lines.head.contains("\"id\":\"99\""),
        s"replay leaked past the subscription regexp: $lines")
    } finally server.close()
  }

  test("multi-table resume: per-table tokens over SKEWED id spaces, each gap exact") {
    import graft.streaming.{ListenResume, PqsClient}
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    // two archives with deliberately skewed id spaces (the shape where a
    // shared scalar token either re-delivers t2's backlog or loses t1's
    // new rows — the committedOffsets lesson at the push edge)
    def archive(n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("listen_multi").toString
      val rows = (0 until n).map(i =>
        (i.toLong, t(i), i.toLong % 3, "INSERT", s"""{"k":$i}"""))
        .toDF("event_id", "ts", "user_id", "op", "props")
      graft.sources.Layout.writeEventArchive(rows, dir)
      dir
    }
    val dirT1 = archive(8)    // t1 ids 0..7
    val dirT2 = archive(500)  // t2 ids 0..499 — far ahead of t1
    val server = new ListenServer(replaySourceByTable = Some(
      ListenResume.multiArchiveReplay(spark,
        Map("t1" -> dirT1, "t2" -> dirT2))))
    try {
      // the disconnected client saw t1 through id 5 and t2 through id 490
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFromTables("127.0.0.1", server.boundPort, ".*",
        Map("t1" -> 5L, "t2" -> 490L), got.add(_), maxEvents = 11)
      val byTable = got.toArray(Array.empty[String])
        .groupBy(PqsClient.eventTable).view
        .mapValues(_.map(PqsClient.eventId).toSeq).toMap
      assert(byTable.keySet == Set("t1", "t2"), s"got ${byTable.keySet}")
      assert(byTable("t1") == Seq(6L, 7L),
        s"t1 gap wrong: ${byTable("t1")}")
      assert(byTable("t2") == (491L to 499L),
        s"t2 gap wrong: ${byTable("t2")}")
    } finally server.close()
  }

  test("resumeAfter against a hub without a replay source is refused loudly") {
    val server = new ListenServer()
    try {
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFrom("127.0.0.1", server.boundPort, ".*", 7L, got.add(_), maxEvents = 1)
      assert(got.size == 1 && got.get(0).contains("error") &&
        got.get(0).contains("replay source"), s"got $got")
    } finally server.close()
  }

  /** Sends a raw handshake, returns (first response line or null, whether the
    * server then closed the stream) — the refusal contract is BOTH: an error
    * line AND a close, never a silent live-only join and never a hang.
    */
  private def rawHandshake(port: Int, handshake: String): (String, Boolean) = {
    val sock = new Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(5000)
      val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
      w.write(handshake + "\n"); w.flush()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      val first = in.readLine()
      val closed = if (first == null) true else in.readLine() == null
      (first, closed)
    } finally sock.close()
  }

  test("unparseable scalar resumeAfter is refused loudly, not silently joined live-only") {
    import graft.streaming.ListenResume
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("listen_badtok").toString
    graft.sources.Layout.writeEventArchive(
      Seq((0L, new java.sql.Timestamp(1000), 0L, "INSERT", """{"k":0}"""))
        .toDF("event_id", "ts", "user_id", "op", "props"), dir)
    val server = new ListenServer(
      replaySource = Some(ListenResume.archiveReplay(spark, dir)))
    try {
      val (line, closed) = rawHandshake(server.boundPort,
        """{"tableRegexp":".*","resumeAfter":"not-a-number"}""")
      assert(line != null && line.contains("error") && line.contains("resume"),
        s"expected an error line, got: $line")
      assert(closed, "server must close after refusing the bad token")
      assert(server.subscriberCount == 0, "bad-token client must not be registered")
    } finally server.close()
  }

  test("unparseable resumeAfterByTable token is refused with an error and a close — no socket hang") {
    // pre-fix: the NumberFormatException escaped the handshake catch, the
    // conn daemon swallowed it, and the client hung forever on a leaked
    // socket with no response at all
    val server = new ListenServer()
    try {
      val (line, closed) = rawHandshake(server.boundPort,
        """{"tableRegexp":".*","resumeAfterByTable":{"t1":"garbage"}}""")
      assert(line != null && line.contains("error"), s"expected an error line, got: $line")
      assert(closed, "server must close after refusing the bad token map")
      assert(server.subscriberCount == 0)
    } finally server.close()
  }

  test("explicit JSON null resume token means live-only — not a refusal") {
    // clients whose serializers emit optional fields as null
    // ("resumeAfter":null) mean "no token", not "a token you must refuse":
    // NullNode.asText() is the string "null", which pre-fix tripped the
    // defined-but-unparseable refusal (and, on a replay-capable hub, the
    // missing-replay-source refusal never applied either way)
    val server = new ListenServer()
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        sock.setSoTimeout(5000)
        val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
        w.write("""{"tableRegexp":".*","resumeAfter":null,"resumeAfterByTable":null}""" + "\n")
        w.flush()
        awaitSubs(server, 1) // registered as a plain live subscriber
        server.publish("t", """{"a":1}""")
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        assert(in.readLine() == """{"a":1}""",
          "null-token subscriber must join live-only, not be refused")
      } finally sock.close()
    } finally server.close()
  }

  test("per-table null tokens mean no-token-for-that-table: the rest of the map still replays") {
    import graft.streaming.ListenResume
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    val dir = java.nio.file.Files.createTempDirectory("listen_nulltab").toString
    graft.sources.Layout.writeEventArchive(
      (0 until 6).map(i => (i.toLong, t(i), 0L, "INSERT", s"""{"k":$i}"""))
        .toDF("event_id", "ts", "user_id", "op", "props"), dir)
    val server = new ListenServer(replaySourceByTable = Some(
      ListenResume.multiArchiveReplay(spark, Map("t1" -> dir))))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        sock.setSoTimeout(5000)
        val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
        // t2's serializer emitted null — that table subscribes fresh; t1's
        // real token still replays its gap (ids 4..5)
        w.write("""{"tableRegexp":".*","resumeAfterByTable":{"t1":"3","t2":null}}""" + "\n")
        w.flush()
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        val got = Seq(in.readLine(), in.readLine()).map(PqsClient.eventId)
        assert(got == Seq(4L, 5L), s"t1 gap must replay despite t2's null token: $got")
      } finally sock.close()
    } finally server.close()
  }

  test("resume across an erasure gap excludes the erased rows, and a replayed batch cannot resurrect them") {
    import graft.streaming.ListenResume
    import spark.implicits._
    def t(i: Long) = new java.sql.Timestamp(1000L * (i + 1))
    val dir = java.nio.file.Files.createTempDirectory("listen_erase_gap").toString
    def batch(ids: Range) = ids.map(i =>
      (i.toLong, t(i), i.toLong % 3, "INSERT", s"""{"k":$i}"""))
      .toDF("event_id", "ts", "user_id", "op", "props")
    val server = new ListenServer(
      replaySource = Some(ListenResume.archiveReplay(spark, dir)))
    try {
      // the subscriber died holding token 5; while it is gone the gap
      // widens AND the GDPR request lands: user 1 (ids ≡ 1 mod 3) erased
      assert(graft.sources.Layout.appendArchiveBatch(batch(0 until 12), dir, 0L))
      val token = 5L
      assert(graft.sources.Layout.appendArchiveBatch(batch(12 until 24), dir, 1L))
      graft.sources.Layout.eraseEntity(spark, dir, 1L)

      val erased = Set(7L, 10L, 13L, 16L, 19L, 22L) // user 1 above the token
      val want = (6L until 24L).filterNot(erased)
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFrom("127.0.0.1", server.boundPort, "events", token,
        got.add(_), maxEvents = want.size)
      val ids = got.toArray(Array.empty[String]).map(PqsClient.eventId).toSeq
      assert(ids == want, s"erasure-gap replay wrong: $ids (want $want)")

      // a replayed batch carrying ONLY the erased user's pre-cutoff rows
      // (an upstream crash re-delivery under a NEW batch id, so the marker
      // dedup does not catch it) is dropped by the tombstone guard:
      // nothing lands, and a second resume stays clean
      val replayRows = Seq(1L, 4L, 7L, 10L).map(i =>
        (i, t(i), 1L, "INSERT", s"""{"k":$i}"""))
        .toDF("event_id", "ts", "user_id", "op", "props")
      assert(graft.sources.Layout.appendArchiveBatch(replayRows, dir, 99L))
      assert(spark.read.parquet(dir).filter(col("user_id") === 1L).count() == 0,
        "tombstone guard let a replayed batch resurrect the erased entity")
      val got2 = new CopyOnWriteArrayList[String]()
      PqsClient.runFrom("127.0.0.1", server.boundPort, "events", token,
        got2.add(_), maxEvents = want.size)
      assert(got2.toArray(Array.empty[String]).map(PqsClient.eventId).toSeq == want,
        "post-replay resume must still exclude the erased rows")
    } finally server.close()
  }

  test("one bad archive line skips with drop accounting — replay survives, resume stays possible") {
    // a malformed \u escape in the table field makes tableOf throw; the
    // replay must count-and-skip it, not kill the resumed subscriber (a
    // persistently bad line would otherwise make resume permanently
    // impossible — every reconnect re-hits it)
    val bad = "{\"schema\":\"public\",\"table\":\"ev\\u00ZZents\",\"op\":\"INSERT\",\"id\":\"1\"}"
    val good = """{"schema":"public","table":"events","op":"INSERT","id":"2","payload":{"k":2}}"""
    val server = new ListenServer(
      replaySource = Some((_: Long) => Iterator(bad, good)))
    try {
      val got = new CopyOnWriteArrayList[String]()
      PqsClient.runFrom("127.0.0.1", server.boundPort, ".*", 0L, got.add(_), maxEvents = 1)
      assert(got.size == 1 && got.get(0) == good,
        s"replay died on the bad line instead of skipping it: $got")
      assert(server.droppedCount == 1,
        s"skipped line must be accounted as a drop: ${server.droppedCount}")
    } finally server.close()
  }

  test("trailing-tab ingest line publishes the event without the separator tab") {
    val server = new ListenServer()
    try {
      val sub = new Sub(server.boundPort, ".*")
      try {
        awaitSubs(server, 1)
        val ing = new Socket("127.0.0.1", server.boundPort)
        val iw = new BufferedWriter(new OutputStreamWriter(ing.getOutputStream, UTF_8))
        iw.write("{\"ingest\":true}\n")
        // an empty third field ('table\tjson\t') must not deliver its
        // separator tab as trailing garbage inside the published event
        iw.write("events\t{\"table\":\"events\",\"id\":\"1\"}\t\n")
        iw.flush()
        sub.await(1)
        assert(sub.lines.size == 1, s"got ${sub.lines}")
        assert(sub.lines.get(0) == """{"table":"events","id":"1"}""",
          s"trailing garbage delivered: [${sub.lines.get(0)}]")
        ing.close()
      } finally sub.close()
    } finally server.close()
  }
}
