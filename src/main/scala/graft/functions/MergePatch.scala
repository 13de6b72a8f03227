package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, NullNode, ObjectNode}
import org.apache.spark.sql.Column

import scala.jdk.CollectionConverters._

/** RFC 7386 JSON merge patch — the one custom scalar the reference mandates.
  *
  * Semantics mirror pqstream's `generatePatch` (reference `patch.go:11-40`,
  * called at `server.go:236` as `generatePatch(payload, previous)`): the
  * produced patch transforms the NEW payload into the OLD one, i.e. keys whose
  * values differ map to the *pre-update* value (observable in reference
  * `README.md:57`). Nil/absent documents are treated as `{}` (`patch.go:13-22`).
  *
  * Output is rendered compactly with object keys sorted, so results are
  * byte-deterministic and comparable against a SQL oracle.
  */
object MergePatch {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private def parseOrEmpty(s: String): JsonNode =
    if (s == null || s.trim.isEmpty) nf.objectNode()
    else mapper.readTree(s)

  /** RFC 7386 diff: the patch that transforms `source` into `target`. */
  def diff(source: JsonNode, target: JsonNode): JsonNode = {
    if (!source.isObject || !target.isObject) return target
    val patch = nf.objectNode()
    // keys in target: added or changed relative to source
    target.properties().asScala.foreach { e =>
      val (k, tv) = (e.getKey, e.getValue)
      if (!source.has(k)) {
        patch.set[ObjectNode](k, tv)
      } else {
        val sv = source.get(k)
        if (sv.isObject && tv.isObject) {
          val sub = diff(sv, tv)
          if (sub.isObject && !sub.isEmpty) patch.set[ObjectNode](k, sub)
          else if (!sub.isObject) patch.set[ObjectNode](k, sub)
        } else if (sv != tv) {
          patch.set[ObjectNode](k, tv)
        }
      }
    }
    // keys in source but not target: deleted -> null per RFC 7386
    source.properties().asScala.foreach { e =>
      if (!target.has(e.getKey)) patch.set[ObjectNode](e.getKey, NullNode.instance)
    }
    patch
  }

  /** RFC 7386 apply: used by the property tests to check
    * `apply(curr, diff(curr, prev)) == prev`.
    */
  def applyPatch(target: JsonNode, patch: JsonNode): JsonNode = {
    if (!patch.isObject) return patch
    val base: ObjectNode =
      if (target != null && target.isObject) target.deepCopy[ObjectNode]()
      else nf.objectNode()
    patch.properties().asScala.foreach { e =>
      val (k, pv) = (e.getKey, e.getValue)
      if (pv.isNull) base.remove(k)
      else if (pv.isObject) base.set[ObjectNode](k, applyPatch(base.get(k), pv))
      else base.set[ObjectNode](k, pv)
    }
    base
  }

  /** Deterministic compact rendering: object keys sorted lexicographically. */
  def render(node: JsonNode): String = {
    if (node.isObject) {
      node.properties().asScala.toSeq.sortBy(_.getKey)
        .map(e => "\"" + escape(e.getKey) + "\":" + render(e.getValue))
        .mkString("{", ",", "}")
    } else if (node.isArray) {
      node.asScala.map(render).mkString("[", ",", "]")
    } else node.toString
  }

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** String-level entry point: (current payload, previous payload) -> patch. */
  def createMergePatch(curr: String, prev: String): String =
    render(diff(parseOrEmpty(curr), parseOrEmpty(prev)))

  def applyMergePatch(target: String, patch: String): String =
    render(applyPatch(parseOrEmpty(target), parseOrEmpty(patch)))

  /** UTF8String entry point called from generated code ([[JsonMergePatch]]'s
    * doGenCode) — nulls mean `{}` (reference patch.go:13-22), never null out.
    */
  def patchUtf8(curr: org.apache.spark.unsafe.types.UTF8String,
                prev: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(createMergePatch(
      if (curr == null) null else curr.toString,
      if (prev == null) null else prev.toString))

  /** Column API: `json_merge_patch(payload, previous)` = the `changes` column
    * of the reference Event (pre-update values, reference `pqstream.proto:45`).
    * Backed by the native Catalyst expression [[JsonMergePatch]].
    */
  def json_merge_patch(curr: Column, prev: Column): Column =
    JsonMergePatch(curr, prev)
}
