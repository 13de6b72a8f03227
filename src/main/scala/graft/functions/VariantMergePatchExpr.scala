package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** RFC 7386 merge patch computed NATIVELY over the Variant binary format —
  * no JSON text round-trip: both documents arrive as Spark 4 `VariantVal`s
  * (the engine's `protobuf.Struct` analog, reference `pqstream.proto:32-33`),
  * the diff walks the binary object encodings directly, and the patch is
  * assembled with `VariantBuilder`. Semantics are IDENTICAL to the string
  * expression [[JsonMergePatch]] (direction new→old, null document = `{}`,
  * arrays replace wholesale — `VariantMergePatchSpec` pins parity case by
  * case), and `to_json` of the result equals the string patch byte-for-byte
  * because both the Variant format and [[MergePatch.render]] emit object
  * keys sorted.
  *
  * Scale note: for deep documents the per-level rebuild costs
  * O(depth × subtree) in the worst case (each level's sub-patch is deep-
  * copied into its parent via `appendVariant`) — same bound as the Jackson
  * tree walk it replaces, minus all string parsing/printing.
  */
object VariantMergePatch {

  private val UTC = java.time.ZoneId.of("UTC")

  /** A canonical empty-object Variant (the RFC's stand-in for an absent
    * document, reference `patch.go:13-22`). Variants are immutable views
    * over byte arrays, so one shared instance is thread-safe.
    */
  private val emptyObj: Variant = {
    val b = new VariantBuilder(false)
    b.finishWritingObject(b.getWritePos,
      new java.util.ArrayList[VariantBuilder.FieldEntry]())
    b.result()
  }

  /** Semantic equality via the deterministic JSON rendering — matches the
    * Jackson `JsonNode.equals` the string expression uses (typed numbers
    * that render differently, e.g. 1 vs 1.0, compare unequal in both).
    */
  private def jsonEq(a: Variant, b: Variant): Boolean =
    a.toJson(UTC) == b.toJson(UTC)

  /** RFC 7386 diff over Variant values: the patch that transforms `src`
    * into `tgt`. Mirrors [[MergePatch.diff]] exactly.
    */
  def diff(src: Variant, tgt: Variant): Variant = {
    if (src.getType != VariantUtil.Type.OBJECT ||
        tgt.getType != VariantUtil.Type.OBJECT) return tgt
    val b = new VariantBuilder(false)
    val start = b.getWritePos
    val fields = new java.util.ArrayList[VariantBuilder.FieldEntry]()
    def addKey(k: String): Unit =
      fields.add(new VariantBuilder.FieldEntry(k, b.addKey(k), b.getWritePos - start))
    // keys in target: added or changed relative to source
    var i = 0
    while (i < tgt.objectSize()) {
      val f = tgt.getFieldAtIndex(i)
      val sv = src.getFieldByKey(f.key)
      if (sv == null) { addKey(f.key); b.appendVariant(f.value) }
      else if (sv.getType == VariantUtil.Type.OBJECT &&
               f.value.getType == VariantUtil.Type.OBJECT) {
        val sub = diff(sv, f.value)
        if (sub.objectSize() > 0) { addKey(f.key); b.appendVariant(sub) }
      } else if (!jsonEq(sv, f.value)) { addKey(f.key); b.appendVariant(f.value) }
      i += 1
    }
    // keys in source but not target: deleted -> JSON null per RFC 7386
    i = 0
    while (i < src.objectSize()) {
      val k = src.getFieldAtIndex(i).key
      if (tgt.getFieldByKey(k) == null) { addKey(k); b.appendNull() }
      i += 1
    }
    b.finishWritingObject(start, fields)
    b.result()
  }

  /** VariantVal entry point called from generated code — nulls mean `{}`
    * (reference `patch.go:13-22`), never null out.
    */
  def patchVariant(curr: VariantVal, prev: VariantVal): VariantVal = {
    val src = if (curr == null) emptyObj else new Variant(curr.getValue, curr.getMetadata)
    val tgt = if (prev == null) emptyObj else new Variant(prev.getValue, prev.getMetadata)
    val p = diff(src, tgt)
    new VariantVal(p.getValue, p.getMetadata)
  }

  /** Column API: `variant_merge_patch(payload_v, previous_v)`. */
  def variant_merge_patch(curr: Column, prev: Column): Column =
    Bridge.column(
      VariantMergePatchExpr(Bridge.expression(curr), Bridge.expression(prev)))
}

/** The Catalyst expression: (variant, variant) -> variant, real codegen via
  * a static call (same pattern as [[JsonMergePatch]]).
  */
case class VariantMergePatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = VariantType
  override def nullable: Boolean = false
  override def prettyName: String = "variant_merge_patch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(e =>
        e.dataType == VariantType || e.dataType == org.apache.spark.sql.types.NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"variant_merge_patch expects (variant, variant), got (${left.dataType}, ${right.dataType})")
  }

  override def eval(input: InternalRow): Any = {
    // NOT nullSafeEval: a null document means {} — see patchVariant
    val l = left.eval(input)
    val r = right.eval(input)
    VariantMergePatch.patchVariant(
      if (l == null) null else l.asInstanceOf[VariantVal],
      if (r == null) null else r.asInstanceOf[VariantVal])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = VariantMergePatch.getClass.getName.stripSuffix("$")
    val vv = classOf[VariantVal].getName
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        $vv ${ev.value} = $cls.patchVariant(
          ${l.isNull} ? null : (($vv) ${l.value}),
          ${r.isNull} ? null : (($vv) ${r.value}));
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VariantMergePatchExpr {
  /** SQL registration: `SELECT variant_merge_patch(parse_json(a), parse_json(b))`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "variant_merge_patch", exprs => VariantMergePatchExpr(exprs(0), exprs(1)), "scala_udf")
}
