package graft.streaming

import java.io.ByteArrayOutputStream

/** Hand-rolled proto3 encoder for the reference's wire messages
  * (`/root/reference/pqstream.proto`) — the MESSAGE layer of the gRPC
  * transport, built from the public protobuf wire-format spec with zero
  * dependencies (varints, tags, length-delimited fields). What this
  * closes: an existing pqstream client's DECODER accepts these bytes as
  * `pqs.Event` verbatim — `ProtoWireSpec` proves it by decoding with the
  * real protobuf runtime (the shaded copy Spark already ships for ORC,
  * test-only). What stays environmental: the HTTP/2 framing gRPC wraps
  * around these bytes (no gRPC in this container) — with this encoder
  * that residue is transport-only.
  *
  * Encoding choices, each matching Go's `structpb`/jsonpb behavior:
  *  - proto3 default omission: empty strings, `UNKNOWN` op, and absent
  *    structs write NO field at all;
  *  - `google.protobuf.Struct` carries JSON objects; every JSON number
  *    becomes `number_value` (a double — the same >2^53 lossiness the
  *    reference has by construction, since Go's structpb does exactly
  *    this);
  *  - map entries emit in the JSON document's key order (protobuf wire
  *    order is not canonical; any conformant decoder accepts it).
  */
object ProtoWire {

  /** `enum Operation` (pqstream.proto): UNKNOWN=0 INSERT=1 UPDATE=2
    * DELETE=3 TRUNCATE=4. */
  def opCode(op: String): Int = op match {
    case "INSERT" => 1
    case "UPDATE" => 2
    case "DELETE" => 3
    case "TRUNCATE" => 4
    case _ => 0
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)
  private def writeString(out: ByteArrayOutputStream, field: Int, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    tag(out, field, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }
  private def writeBytes(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    tag(out, field, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  // ===== google.protobuf.Value / Struct / ListValue over Jackson trees =====

  private def valueBytes(n: com.fasterxml.jackson.databind.JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    if (n == null || n.isNull) { tag(out, 1, 0); writeVarint(out, 0L) } // null_value
    else if (n.isNumber) {
      tag(out, 2, 1) // number_value, fixed64
      val bits = java.lang.Double.doubleToLongBits(n.asDouble())
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    else if (n.isTextual) writeString(out, 3, n.asText())
    else if (n.isBoolean) { tag(out, 4, 0); writeVarint(out, if (n.asBoolean()) 1L else 0L) }
    else if (n.isObject) writeBytes(out, 5, structBytes(n))
    else if (n.isArray) {
      val lv = new ByteArrayOutputStream(32)
      val it = n.elements()
      while (it.hasNext) writeBytes(lv, 1, valueBytes(it.next())) // ListValue.values
      writeBytes(out, 6, lv.toByteArray)
    }
    else writeString(out, 3, n.asText()) // unreachable for well-formed JSON
    out.toByteArray
  }

  private def structBytes(n: com.fasterxml.jackson.databind.JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    val it = n.fields()
    while (it.hasNext) {
      val e = it.next()
      val entry = new ByteArrayOutputStream(48)
      writeString(entry, 1, e.getKey)           // map key
      writeBytes(entry, 2, valueBytes(e.getValue)) // map value (Value)
      writeBytes(out, 1, entry.toByteArray)     // Struct.fields entry
    }
    out.toByteArray
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Pipeline form: the jsonpb envelope columns (the same six
    * [[Listen.eventJson]] takes — schema, table, op, id, payload,
    * changes) mapped to wire-ready `pqs.Event` frames. Works on batch
    * and streaming frames alike; a binary sink (length-prefixed socket,
    * Kafka value, a future gRPC shim) ships the bytes as-is.
    */
  def eventFrames(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("schema", "table", "op", "id", "payload", "changes")
      .map(r => eventBytes(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5)))
  }

  /** Decoded `pqs.Event` — op back as its name, structs back as JSON
    * text (the engine's payload currency). */
  case class Event(schema: String, table: String, op: String, id: String,
                   payload: String, changes: String)

  private val opNames = Array("UNKNOWN", "INSERT", "UPDATE", "DELETE", "TRUNCATE")

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val x = b(pos); pos += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      val r = new Reader(b, pos, pos + n); pos += n; r
    }
    def str(): String = {
      val n = varint().toInt
      val s = new String(b, pos, n, "UTF-8"); pos += n; s
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(pos).toLong & 0xFF) << (8 * i); pos += 1; i += 1 }
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  private def readValue(r: Reader): com.fasterxml.jackson.databind.JsonNode = {
    val nf = mapper.getNodeFactory
    var out: com.fasterxml.jackson.databind.JsonNode = nf.nullNode()
    while (r.hasMore) {
      val t = r.varint()
      ((t >>> 3).toInt, (t & 7).toInt) match {
        case (1, 0) => r.varint(); out = nf.nullNode()
        case (2, 1) => out = nf.numberNode(java.lang.Double.longBitsToDouble(r.fixed64()))
        case (3, 2) => out = nf.textNode(r.str())
        case (4, 0) => out = nf.booleanNode(r.varint() != 0L)
        case (5, 2) => out = readStruct(r.lenDelim())
        case (6, 2) =>
          val arr = mapper.createArrayNode()
          val lv = r.lenDelim()
          while (lv.hasMore) {
            val lt = lv.varint()
            if ((lt >>> 3).toInt == 1) arr.add(readValue(lv.lenDelim()))
            else lv.skip((lt & 7).toInt)
          }
          out = arr
        case (_, w) => r.skip(w)
      }
    }
    out
  }

  private def readStruct(r: Reader): com.fasterxml.jackson.databind.node.ObjectNode = {
    val obj = mapper.createObjectNode()
    while (r.hasMore) {
      val t = r.varint()
      if ((t >>> 3).toInt == 1 && (t & 7).toInt == 2) {
        val e = r.lenDelim()
        var key: String = null
        var value: com.fasterxml.jackson.databind.JsonNode = mapper.nullNode()
        while (e.hasMore) {
          val et = e.varint()
          ((et >>> 3).toInt, (et & 7).toInt) match {
            case (1, 2) => key = e.str()
            case (2, 2) => value = readValue(e.lenDelim())
            case (_, w) => e.skip(w)
          }
        }
        if (key != null) obj.set[com.fasterxml.jackson.databind.JsonNode](key, value)
      } else r.skip((t & 7).toInt)
    }
    obj
  }

  /** DECODER — the consuming direction: the engine can now ingest a
    * pqstream `Event` feed, not only produce one (pqstream-to-pqstream
    * bridging; unknown fields skipped per proto3 forward-compatibility).
    * Built hand-rolled like the encoder, but NOT trusted on its own
    * word: `ProtoWireSpec` pins the encode→decode round trip AND both
    * directions against the real protobuf runtime.
    */
  def decodeEvent(bytes: Array[Byte]): Event = {
    val r = new Reader(bytes, 0, bytes.length)
    var schema = ""; var table = ""; var op = "UNKNOWN"; var id = ""
    var payload: String = null; var changes: String = null
    while (r.hasMore) {
      val t = r.varint()
      ((t >>> 3).toInt, (t & 7).toInt) match {
        case (1, 2) => schema = r.str()
        case (2, 2) => table = r.str()
        case (3, 0) =>
          val c = r.varint().toInt
          op = if (c >= 0 && c < opNames.length) opNames(c) else "UNKNOWN"
        case (4, 2) => id = r.str()
        case (5, 2) => payload = readStruct(r.lenDelim()).toString
        case (6, 2) => changes = readStruct(r.lenDelim()).toString
        case (_, w) => r.skip(w)
      }
    }
    Event(schema, table, op, id, payload, changes)
  }

  /** `message Event` bytes: schema=1, table=2, op=3 (enum), id=4,
    * payload=5 (Struct), changes=6 (Struct). Null/empty JSON docs omit
    * their field (proto3 absence, matching the jsonpb envelope's
    * omission of absent fields — `Listen.eventJson`).
    */
  def eventBytes(schema: String, table: String, op: String, id: String,
                 payloadJson: String, changesJson: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    if (schema != null && schema.nonEmpty) writeString(out, 1, schema)
    if (table != null && table.nonEmpty) writeString(out, 2, table)
    val oc = opCode(op)
    if (oc != 0) { tag(out, 3, 0); writeVarint(out, oc.toLong) }
    if (id != null && id.nonEmpty) writeString(out, 4, id)
    if (payloadJson != null && payloadJson.nonEmpty)
      writeBytes(out, 5, structBytes(mapper.readTree(payloadJson)))
    if (changesJson != null && changesJson.nonEmpty)
      writeBytes(out, 6, structBytes(mapper.readTree(changesJson)))
    out.toByteArray
  }

  /** `frame` behind its varint length prefix — the exact bytes one event
    * occupies on a proto subscriber's socket.
    */
  def framed(frame: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(frame.length + 5)
    writeVarint(out, frame.length.toLong)
    out.write(frame, 0, frame.length)
    out.toByteArray
  }

  /** Varint-framed `pqs.Event` from an envelope JSON line, base64 so it
    * rides the hub's string-typed queues and the `\t`-separated ingest
    * protocol. The hub's LAZY fallback — computed at most once per
    * PUBLISHED event when the pipeline didn't pre-encode (the encode-once
    * hoist is [[eventFrames]]).
    */
  def framedEventBase64(eventJsonLine: String): String = {
    val n = mapper.readTree(eventJsonLine)
    def s(f: String) = Option(n.get(f)).map(_.asText()).getOrElse("")
    def doc(f: String) = Option(n.get(f)).map(_.toString).orNull
    java.util.Base64.getEncoder.encodeToString(framed(eventBytes(
      s("schema"), s("table"), s("op"), s("id"), doc("payload"), doc("changes"))))
  }

  /** Codegen entry point ([[eventFrames]]'s `StaticInvoke` target):
    * internal string types in, framed base64 out.
    */
  def eventFrameB64(schema: org.apache.spark.unsafe.types.UTF8String,
                    table: org.apache.spark.unsafe.types.UTF8String,
                    op: org.apache.spark.unsafe.types.UTF8String,
                    id: org.apache.spark.unsafe.types.UTF8String,
                    payload: org.apache.spark.unsafe.types.UTF8String,
                    changes: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    def str(u: org.apache.spark.unsafe.types.UTF8String): String =
      if (u == null) null else u.toString
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.util.Base64.getEncoder.encodeToString(framed(eventBytes(
        str(schema), str(table), str(op), str(id), str(payload), str(changes)))))
  }

  /** ENCODE-ONCE pipeline column: the varint-framed `pqs.Event` bytes
    * (base64) computed ON THE EXECUTORS, once per event — N proto
    * subscribers then fan out the identical pre-encoded frame with zero
    * per-subscriber parse/encode work (r10 measured that per-DELIVERED
    * cost at ~4× the JSON line path). Ship it as the ingest line's third
    * field ([[ListenSink]] forwards a 3-column frame) or hand it to
    * `ListenServer.publish(table, json, frame)` directly. Codegen'd via
    * `StaticInvoke` — no UDF serialization, stays inside whole-stage
    * codegen like the engine's other native expressions.
    */
  def eventFrames(schema: org.apache.spark.sql.Column,
                  table: org.apache.spark.sql.Column,
                  op: org.apache.spark.sql.Column,
                  id: org.apache.spark.sql.Column,
                  payload: org.apache.spark.sql.Column,
                  changes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.Bridge
    import org.apache.spark.sql.types.StringType
    Bridge.column(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      ProtoWire.getClass,
      StringType,
      "eventFrameB64",
      Seq(schema, table, op, id.cast("string"), payload, changes).map(Bridge.expression),
      inputTypes = Seq.fill(6)(StringType),
      propagateNull = false,
      returnNullable = false))
  }
}
