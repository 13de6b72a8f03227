package graft.streaming

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import java.util.regex.{Pattern, PatternSyntaxException}

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.ForeachWriter
import org.apache.spark.sql.functions._

/** Push transport — the analog of the reference's server-streaming `Listen`
  * RPC (reference `pqstream.proto:7-10`, `server.go:284-315`): a client
  * connects, sends a `ListenRequest` carrying a table regexp, and receives an
  * unbounded stream of `Event` messages filtered to matching tables.
  *
  * Spark-first re-expression with ZERO new dependencies (the container has no
  * gRPC; `java.net` + newline-delimited UTF-8 JSON carries the same message
  * flow, consumable from any language — the `clients/{node,python,ruby}`
  * analog is a ten-line socket reader, see README):
  *
  *  - The HUB ([[ListenServer]]) is the `pqsd` process analog: it owns the
  *    subscriber registry and applies each subscription's regexp server-side
  *    (reference `server.go:290-296` compiles per-request). One hub per
  *    deployment, exactly like the reference's single server — at larger
  *    fan-out, shard hubs by table-hash and point each executor partition at
  *    its shard.
  *  - INGEST is distributed: each executor partition opens its own socket to
  *    the hub ([[ListenSink.writer]]) — no driver funnel, no `.collect()`.
  *    The expensive work (redaction, tiering, merge patch, JSON encoding)
  *    happens in codegen'd expressions ON THE EXECUTORS; the hub's hot path
  *    only reads a line, splits off the table name, and pattern-matches —
  *    it never parses a payload.
  *  - Delivery is AT-MOST-ONCE per subscriber, matching the reference, which
  *    drops events for subscribers that fall behind (`server.go:249-253`
  *    non-blocking redact/fan-out select). Here each subscriber owns a
  *    bounded queue; a full queue drops the newest event and counts it
  *    ([[ListenServer.droppedCount]]). For exactly-once delivery use the
  *    pull path ([[CdcSource]] → [[CdcSink]]) — this transport exists for
  *    the reference's interactive tail-the-database use case.
  *
  * Wire protocol (all lines UTF-8, '\n'-terminated):
  * {{{
  *   subscriber:  C->S  {"tableRegexp":".*"}          (the ListenRequest)
  *                S->C  {"schema":...,"table":...}    (Event JSON, repeated)
  *   ingest:      C->S  {"ingest":true}
  *                C->S  <table>\t<event-json>          (repeated)
  * }}}
  * An invalid regexp answers `{"error":"..."}` and closes — the reference
  * returns the `regexp.Compile` error from the RPC (`server.go:291-293`).
  */
object Listen {

  /** Builds the reference's `Event` JSON wire shape (`pqstream.proto:37-47`
    * as jsonpb prints it, `cmd/pqs/main.go:66-73`): `payload` and `changes`
    * are spliced in as NESTED JSON documents (they are already JSON text in
    * the pipeline), and absent fields are OMITTED — proto3 jsonpb omits
    * unset message fields, so an INSERT has no `changes` key and a
    * tier-dropped payload vanishes rather than appearing as null.
    * Pure codegen'd `concat`/`when` — runs distributed, never on the hub.
    */
  /** JSON string-escape for the spliced envelope values: backslash, quote,
    * the short-form control escapes, and EVERY remaining U+0000–U+001F in
    * backslash-u-XXXX form — jsonpb escapes string fields unconditionally,
    * so a table named `a"b` must reach the wire as `a\"b` and an embedded
    * U+0001 as its four-hex-digit escape, never as invalid JSON (or a
    * broken newline-delimited frame).
    * Pure codegen'd `regexp_replace` chain (backslash FIRST so later
    * escapes aren't double-escaped); in practice schema/table are literals,
    * so the whole chain constant-folds at plan time. Per-row columns whose
    * domain excludes bare control characters take [[jsonEscapeBasic]]
    * instead — see there.
    */
  private val NamedEscapes = Seq(
    "\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"",
    "\n" -> "\\\\n", "\r" -> "\\\\r", "\t" -> "\\\\t")

  private def jsonEscape(c: Column): Column = {
    // the 29 control characters without a short escape, each to its
    // four-hex-digit backslash-u escape
    val rest = (0x00 to 0x1f).filterNot(Seq(0x09, 0x0a, 0x0d).contains)
      .map(cp => "\\x%02x".format(cp) -> "\\\\u%04x".format(cp))
    (NamedEscapes ++ rest).foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }
  }

  /** The short chain for columns whose DOMAIN excludes bare control
    * characters — `op` is a closed enum, `id` a rendered number — so the
    * 29 per-row `backslash-u` passes of [[jsonEscape]] would be guaranteed
    * no-ops on the latency-floor delivery path. Backslash/quote/named
    * escapes still apply (defense in depth at ~zero cost).
    */
  private def jsonEscapeBasic(c: Column): Column =
    NamedEscapes.foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  def eventJson(schema: Column, table: Column, op: Column, id: Column,
                payload: Column, changes: Column): Column = {
    val head = concat(
      lit("{\"schema\":\""), jsonEscape(schema),
      lit("\",\"table\":\""), jsonEscape(table),
      lit("\",\"op\":\""), jsonEscapeBasic(op),
      lit("\",\"id\":\""), jsonEscapeBasic(id.cast("string")), lit("\""))
    concat(
      head,
      when(payload.isNotNull, concat(lit(",\"payload\":"), payload)).otherwise(lit("")),
      when(changes.isNotNull, concat(lit(",\"changes\":"), changes)).otherwise(lit("")),
      lit("}"))
  }
}

/** The fan-out hub. `port = 0` binds an ephemeral port ([[boundPort]]).
  * All threads are daemons; [[close]] tears everything down.
  */
class ListenServer(port: Int = 0, queueCapacity: Int = 1024) extends AutoCloseable {

  private val server = new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
  private val closed = new AtomicBoolean(false)
  private val dropped = new AtomicLong(0)
  private val subs = new ConcurrentHashMap[Subscriber, java.lang.Boolean]()

  def boundPort: Int = server.getLocalPort
  def droppedCount: Long = dropped.get
  def subscriberCount: Int = subs.size
  /** Per-subscriber loss, keyed by overflow policy — the observability a
    * shared total can't give (with mixed policies on one hub, the global
    * counter can't say WHOSE queue overflowed).
    */
  def dropsByPolicy: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    subs.keySet.asScala.toSeq
      .groupBy(s => if (s.dropOldest) "drop-oldest" else "drop-newest")
      .map { case (k, ss) => k -> ss.map(_.drops.get).sum }
  }

  /** In-process publish — the same path ingest connections take.
    *
    * Overflow policy per subscriber: the default drops the NEW event
    * (faithful to the reference's non-blocking send, `server.go:249-253` —
    * its own TODO at `:291` anticipates buffering); a `drop-oldest`
    * subscriber instead evicts the STALEST queued event to admit the new
    * one — same at-most-once loss accounting, but a slow tail-watcher
    * keeps the freshest events (what a dashboard wants) at the price of
    * holes earlier in the stream. Loss counts land in [[droppedCount]]
    * either way; the trade is measured in `ListenBench`.
    */
  def publish(table: String, eventJson: String): Unit = {
    val it = subs.keySet.iterator
    while (it.hasNext) {
      val s = it.next()
      if (s.pattern.matcher(table).find()) { // Go RE2 MatchString: unanchored
        if (!s.queue.offer(eventJson)) {
          if (s.dropOldest) {
            var admitted = false
            while (!admitted) {
              // evict the stalest (races the writer: a null poll means the
              // writer freed the slot itself — nothing was lost)
              if (s.queue.poll() != null) { dropped.incrementAndGet(); s.drops.incrementAndGet() }
              admitted = s.queue.offer(eventJson)
            }
          } else { dropped.incrementAndGet(); s.drops.incrementAndGet() } // at-most-once on the new event
        }
      }
    }
  }

  private final class Subscriber(val pattern: Pattern, socket: Socket,
                                 capacity: Int, val dropOldest: Boolean,
                                 protoFrames: Boolean = false) {
    val queue = new ArrayBlockingQueue[String](capacity)
    val drops = new AtomicLong(0)
    val ready = new CountDownLatch(1) // registration visible before first event
    private val gone = new AtomicBoolean(false)
    val writerThread: Thread = daemon(s"listen-sub-writer") {
      try {
        if (protoFrames) {
          // BINARY mode ("format":"proto" in the handshake): each event as
          // a varint-length-prefixed pqs.Event protobuf frame — the proven
          // ProtoWire bytes to a plain socket, the last engine-side step
          // short of gRPC itself. Conversion happens HERE, per subscriber,
          // so the hub's hot path and JSON subscribers are untouched.
          val out = new java.io.BufferedOutputStream(socket.getOutputStream)
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          ready.countDown()
          while (!closed.get && !gone.get) {
            val line = queue.poll(200, TimeUnit.MILLISECONDS)
            if (line != null) {
              val n = om.readTree(line)
              def s(f: String) = Option(n.get(f)).map(_.asText()).getOrElse("")
              def doc(f: String) = Option(n.get(f)).map(_.toString).orNull
              val frame = ProtoWire.eventBytes(s("schema"), s("table"),
                s("op"), s("id"), doc("payload"), doc("changes"))
              var v = frame.length
              while ((v & ~0x7F) != 0) { out.write((v & 0x7F) | 0x80); v >>>= 7 }
              out.write(v)
              out.write(frame); out.flush()
            }
          }
        } else {
          val w = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
          ready.countDown()
          while (!closed.get && !gone.get) {
            val line = queue.poll(200, TimeUnit.MILLISECONDS)
            if (line != null) { w.write(line); w.write('\n'); w.flush() }
          }
        }
      } catch { case _: Throwable => () } // client went away: unregister below
      finally remove()
    }
    def remove(): Unit = if (gone.compareAndSet(false, true)) {
      subs.remove(this)
      try socket.close() catch { case _: Throwable => () }
    }
  }

  private def daemon(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true); t.start(); t
  }

  // the handshake line is control-plane, not the hot path: Jackson (shipped
  // with Spark) parses it once per connection
  private def handshakeField(line: String, field: String): Option[String] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      val node = om.readTree(line)
      Option(node.get(field)).map(_.asText())
    } catch { case _: Throwable => None }
  }

  private def handleConnection(socket: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
    val first = in.readLine()
    if (first == null) { socket.close(); return }
    if (handshakeField(first, "ingest").isDefined) {
      // ingest: executor partitions stream `table \t json` lines at us
      var line = in.readLine()
      while (line != null && !closed.get) {
        val tab = line.indexOf('\t')
        if (tab > 0) publish(line.substring(0, tab), line.substring(tab + 1))
        line = in.readLine()
      }
      socket.close()
    } else {
      handshakeField(first, "tableRegexp") match {
        case Some(re) =>
          try {
            val p = Pattern.compile(re)
            // opt-in per-subscriber buffer tuning in the ListenRequest:
            // "buffer" overrides the queue capacity, "policy":"drop-oldest"
            // keeps the freshest events under overflow (see publish)
            val cap = handshakeField(first, "buffer")
              .flatMap(v => scala.util.Try(v.toInt).toOption)
              .filter(_ > 0).getOrElse(queueCapacity)
            val dropOldest = handshakeField(first, "policy").contains("drop-oldest")
            // "format":"proto" = varint-length-prefixed pqs.Event frames
            val proto = handshakeField(first, "format").contains("proto")
            val s = new Subscriber(p, socket, cap, dropOldest, proto)
            subs.put(s, java.lang.Boolean.TRUE)
            s.ready.await(5, TimeUnit.SECONDS)
            // reader side: only used to detect client disconnect
            try { while (in.readLine() != null) () } catch { case _: Throwable => () }
            s.remove()
          } catch {
            case e: PatternSyntaxException =>
              val w = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
              w.write("{\"error\":" + quote(e.getMessage) + "}\n"); w.flush()
              socket.close()
          }
        case None =>
          val w = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
          w.write("{\"error\":\"expected a ListenRequest {\\\"tableRegexp\\\":...}\"}\n")
          w.flush()
          socket.close()
      }
    }
  }

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  daemon("listen-accept") {
    try {
      while (!closed.get) {
        val s = server.accept()
        daemon(s"listen-conn") { try handleConnection(s) catch { case _: Throwable => () } }
      }
    } catch { case _: Throwable => () } // server socket closed
  }

  override def close(): Unit = if (closed.compareAndSet(false, true)) {
    try server.close() catch { case _: Throwable => () }
    subs.keySet.forEach(_.remove())
  }
}

/** Executor-side ingest: a `ForeachWriter` over rows of (table, event_json).
  * One socket per partition per epoch — the write path scales with the
  * cluster; the hub only fans out. At-most-once by design (see [[Listen]]).
  */
object ListenSink {
  def writer(host: String, port: Int): ForeachWriter[Row] =
    new SocketEventWriter(host, port, flushEach = false)

  /** Continuous-trigger variant: flush per record. Under `Trigger.
    * Continuous` the writer stays open for the WHOLE epoch (seconds),
    * so batch-grain flushing (right for micro-batch, where close() follows
    * the batch immediately) would buffer events for the full epoch and
    * forfeit the ms-class record path. Tail traffic is single events —
    * a flush per line IS the steady-state write shape.
    */
  def continuousWriter(host: String, port: Int): ForeachWriter[Row] =
    new SocketEventWriter(host, port, flushEach = true)
}

/** Named top-level class (not an anonymous inner class) so the instance
  * serialized to executors carries only (host, port) — no outer reference.
  */
final class SocketEventWriter(host: String, port: Int, flushEach: Boolean)
    extends ForeachWriter[Row] {
  @transient private var socket: Socket = _
  @transient private var out: BufferedWriter = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    socket = new Socket(host, port)
    out = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
    out.write("{\"ingest\":true}\n")
    if (flushEach) out.flush()
    true
  }

  override def process(row: Row): Unit = {
    out.write(row.getString(0)); out.write('\t')
    out.write(row.getString(1)); out.write('\n')
    if (flushEach) out.flush()
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (out != null) { try { out.flush() } catch { case _: Throwable => () } }
    if (socket != null) { try socket.close() catch { case _: Throwable => () } }
  }
}

/** The `pqs` CLI analog (reference `cmd/pqs/main.go:26-77`): connect, send the
  * ListenRequest, print each Event JSON line to stdout until EOF.
  * Usage: `runMain graft.streaming.PqsClient --connect host:port --tables .*`
  */
object PqsClient {

  /** Connection loop factored out so the spec can drive it against a live
    * hub and capture output. Returns when the server closes the stream or
    * `maxEvents` lines have been printed (maxEvents <= 0: unbounded).
    */
  def run(host: String, port: Int, tableRegexp: String,
          sink: String => Unit, maxEvents: Int = -1): Unit = {
    val socket = new Socket(host, port)
    try {
      val w = new BufferedWriter(new OutputStreamWriter(socket.getOutputStream, UTF_8))
      w.write("{\"tableRegexp\":" + jsonQuote(tableRegexp) + "}\n"); w.flush()
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
      var n = 0
      var line = in.readLine()
      while (line != null && (maxEvents <= 0 || n < maxEvents)) {
        sink(line); n += 1
        line = if (maxEvents > 0 && n >= maxEvents) null else in.readLine()
      }
    } finally socket.close()
  }

  private def jsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    var connect = ":7000"; var tables = ".*"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--connect" => connect = args(i + 1); i += 2
        case "--tables"  => tables = args(i + 1); i += 2
        case other       => sys.error(s"unknown flag: $other")
      }
    }
    val colon = connect.lastIndexOf(':')
    val host = if (colon <= 0) "127.0.0.1" else connect.substring(0, colon)
    val port = connect.substring(colon + 1).toInt
    run(host, port, tables, println)
  }
}
