package graft

import graft.streaming.ProtoWire
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
// CONFORMANCE DECODER, test-only: the real protobuf runtime as shaded
// into the ORC jars Spark already ships — an independent implementation
// of the wire format that must accept our bytes
import org.apache.orc.protobuf.CodedInputStream

class ProtoWireSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private def decodeValue(b: Array[Byte]): JsonNode = {
    val in = CodedInputStream.newInstance(b)
    var out: JsonNode = null
    var t = in.readTag()
    while (t != 0) {
      (t >>> 3) match {
        case 1 => in.readEnum(); out = mapper.nullNode()
        case 2 => out = mapper.getNodeFactory.numberNode(in.readDouble())
        case 3 => out = mapper.getNodeFactory.textNode(in.readString())
        case 4 => out = mapper.getNodeFactory.booleanNode(in.readBool())
        case 5 => out = decodeStruct(in.readByteArray())
        case 6 => out = decodeList(in.readByteArray())
      }
      t = in.readTag()
    }
    out
  }
  private def decodeList(b: Array[Byte]): ArrayNode = {
    val in = CodedInputStream.newInstance(b)
    val arr = mapper.createArrayNode()
    var t = in.readTag()
    while (t != 0) {
      assert((t >>> 3) == 1, s"ListValue field ${t >>> 3}")
      arr.add(decodeValue(in.readByteArray()))
      t = in.readTag()
    }
    arr
  }
  private def decodeStruct(b: Array[Byte]): ObjectNode = {
    val in = CodedInputStream.newInstance(b)
    val obj = mapper.createObjectNode()
    var t = in.readTag()
    while (t != 0) {
      assert((t >>> 3) == 1, s"Struct field ${t >>> 3}")
      val entry = CodedInputStream.newInstance(in.readByteArray())
      var key: String = null
      var value: JsonNode = null
      var et = entry.readTag()
      while (et != 0) {
        (et >>> 3) match {
          case 1 => key = entry.readString()
          case 2 => value = decodeValue(entry.readByteArray())
        }
        et = entry.readTag()
      }
      obj.set(key, value)
      t = in.readTag()
    }
    obj
  }
  /** Decoded Event: (fieldNumber → scalar/struct). */
  private def decodeEvent(b: Array[Byte]): Map[Int, Any] = {
    val in = CodedInputStream.newInstance(b)
    var m = Map.empty[Int, Any]
    var t = in.readTag()
    while (t != 0) {
      (t >>> 3) match {
        case f @ (1 | 2 | 4) => m += f -> in.readString()
        case 3               => m += 3 -> in.readEnum()
        case f @ (5 | 6)     => m += f -> decodeStruct(in.readByteArray())
      }
      t = in.readTag()
    }
    m
  }

  /** JSON numbers all become protobuf doubles — normalize the INPUT the
    * same way before comparing (the reference's structpb does this too).
    */
  private def normNum(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fields().forEachRemaining(e => out.set[JsonNode](e.getKey, normNum(e.getValue)))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.elements().forEachRemaining(v => out.add(normNum(v)))
      out
    case _ if n.isNumber => mapper.getNodeFactory.numberNode(n.asDouble())
    case _ => n
  }

  test("Event bytes decode with the real protobuf runtime: fields, enum, Struct payloads") {
    val payload = """{"k": 7, "name": "café \"quoted\"\nline", "ok": true,
      "nested": {"a": [1, "two", null, {"deep": 2.5}], "b": false},
      "long": """ + "\"" + ("x" * 300) + "\"}"
    val changes = """{"k": 8}"""
    val b = ProtoWire.eventBytes("public", "events", "UPDATE", "42", payload, changes)
    val ev = decodeEvent(b)
    assert(ev(1) == "public" && ev(2) == "events" && ev(4) == "42")
    assert(ev(3) == 2, "UPDATE must be enum 2 per pqstream.proto")
    assert(ev(5).asInstanceOf[ObjectNode] == normNum(mapper.readTree(payload)),
      s"payload tree diverged: ${ev(5)}")
    assert(ev(6).asInstanceOf[ObjectNode] == normNum(mapper.readTree(changes)))
  }

  test("proto3 default omission: absent/empty fields write nothing") {
    val b = ProtoWire.eventBytes("", "t", "DELETE", "9", null, null)
    val ev = decodeEvent(b)
    assert(!ev.contains(1), "empty schema must be omitted")
    assert(!ev.contains(5) && !ev.contains(6), "absent structs must be omitted")
    assert(ev(3) == 3 && ev(2) == "t" && ev(4) == "9")
    // INSERT-with-payload omits changes; UNKNOWN op omits field 3
    val ins = decodeEvent(ProtoWire.eventBytes("s", "t", "INSERT", "1", """{"a":1}""", null))
    assert(ins(3) == 1 && ins.contains(5) && !ins.contains(6))
    assert(!decodeEvent(ProtoWire.eventBytes("s", "t", "nope", "1", null, null)).contains(3))
  }

  test("all operation codes match the reference enum") {
    assert(Seq("UNKNOWN", "INSERT", "UPDATE", "DELETE", "TRUNCATE")
      .map(ProtoWire.opCode) == Seq(0, 1, 2, 3, 4))
  }

  test("decoder round trip: encode -> decode preserves every field and payload tree") {
    val payload = """{"k": 7, "s": "héllo\n", "arr": [1, null, {"d": true}], "o": {"x": 1.25}}"""
    val changes = """{"k": 9}"""
    val ev = ProtoWire.decodeEvent(
      ProtoWire.eventBytes("public", "events", "UPDATE", "42", payload, changes))
    assert(ev.schema == "public" && ev.table == "events" &&
      ev.op == "UPDATE" && ev.id == "42")
    assert(mapper.readTree(ev.payload) == normNum(mapper.readTree(payload)))
    assert(mapper.readTree(ev.changes) == normNum(mapper.readTree(changes)))
    // omission decodes to proto3 defaults / absent structs
    val d = ProtoWire.decodeEvent(ProtoWire.eventBytes("", "t", "DELETE", "9", null, null))
    assert(d.schema == "" && d.op == "DELETE" && d.payload == null && d.changes == null)
    // forward compatibility: a decoder must skip unknown fields — splice
    // an unknown field 9 (varint) + field 10 (len-delimited) in front
    val base = ProtoWire.eventBytes("s", "t", "INSERT", "1", """{"a":1}""", null)
    val spliced = Array[Byte]((9 << 3).toByte, 5, ((10 << 3) | 2).toByte, 2, 1, 2) ++ base
    val f = ProtoWire.decodeEvent(spliced)
    assert(f.table == "t" && f.op == "INSERT" &&
      mapper.readTree(f.payload) == normNum(mapper.readTree("""{"a":1}""")))
  }

  test("eventFrames: envelope columns to wire-ready frames, distributed") {
    import spark.implicits._
    val df = Seq(
      ("public", "events", "INSERT", "7", """{"k":1}""", null.asInstanceOf[String]),
      ("public", "events", "UPDATE", "8", """{"k":2}""", """{"k":1}"""))
      .toDF("schema", "table", "op", "id", "payload", "changes")
    val frames = ProtoWire.eventFrames(df).collect()
    assert(frames.length == 2)
    val e1 = decodeEvent(frames.find(decodeEvent(_)(4) == "8").get)
    assert(e1(3) == 2 && e1(6).asInstanceOf[ObjectNode] ==
      normNum(mapper.readTree("""{"k":1}""")))
  }

  test("eventFrames column (encode-once hoist) matches the hub's lazy encoder byte-for-byte") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      ("public", "events", "UPDATE", 7L, """{"k":2}""", """{"k":1}"""),
      ("public", "users", "INSERT", 8L, """{"a":true}""", null),
      ("s", "t", "DELETE", 9L, null, null))
      .toDF("schema", "table", "op", "id", "payload", "changes")
    val frames = df.select(ProtoWire.eventFrames(col("schema"), col("table"),
        col("op"), col("id"), col("payload"), col("changes")).as("f"))
      .as[String].collect().toSeq
    // the lazy path starts from the envelope JSON line the hub sees
    val lines = df.select(graft.streaming.Listen.eventJson(col("schema"),
        col("table"), col("op"), col("id"), col("payload"), col("changes")))
      .as[String].collect().toSeq
    assert(frames == lines.map(ProtoWire.framedEventBase64),
      "pipeline-column frames diverge from hub-side lazy encoding")
    // and the framed bytes decode back to the event (strip the varint prefix)
    val raw = java.util.Base64.getDecoder.decode(frames.head)
    var i = 0; var len = 0; var shift = 0
    var more = true
    while (more) {
      len |= (raw(i) & 0x7F) << shift
      more = (raw(i) & 0x80) != 0; shift += 7; i += 1
    }
    assert(raw.length - i == len, "varint length prefix wrong")
    val ev = ProtoWire.decodeEvent(java.util.Arrays.copyOfRange(raw, i, raw.length))
    assert(ev.table == "events" && ev.op == "UPDATE" && ev.id == "7")
  }
}
