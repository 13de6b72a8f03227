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
}
