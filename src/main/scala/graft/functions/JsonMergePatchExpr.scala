package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the RFC 7386 merge patch — replaces the v0
  * Scala UDF (no encoder round-trip, participates in the expression tree for
  * constant folding / null propagation control).
  *
  * Null semantics follow the reference (`patch.go:13-22`): a null document is
  * treated as `{}`, so the expression itself never returns null — which a UDF
  * cannot express (Spark assumes UDFs are null-in/null-out under
  * spark.sql.udf behaviors) without boxing games.
  *
  * Malformed JSON throws (ANSI-style); route untrusted rows through
  * [[graft.cdc.DeadLetter]] first — the engine's malformed-row policy
  * (the reference daemon instead DIES on its first malformed notification,
  * `server.go:219-222` + `270-272`).
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "json_merge_patch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(e =>
        e.dataType == StringType || e.dataType == org.apache.spark.sql.types.NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_merge_patch expects (string, string), got (${left.dataType}, ${right.dataType})")
  }

  override def eval(input: InternalRow): Any = {
    // deliberately NOT nullSafeEval: null payloads mean {} (reference
    // patch.go:13-22), they do not null out the patch
    val l = left.eval(input)
    val r = right.eval(input)
    UTF8String.fromString(MergePatch.createMergePatch(
      if (l == null) null else l.toString,
      if (r == null) null else r.toString))
  }

  /** Real codegen (not CodegenFallback): emits a static call into
    * [[MergePatch.patchUtf8]], so this expression joins the surrounding
    * whole-stage-codegen span instead of splitting it — the same pattern
    * Spark's own regexp/json expressions use for non-trivial kernels. Children
    * may be null (meaning `{}`), so this is NOT nullSafeCodeGen. The explicit
    * UTF8String casts keep the call compilable when a child is a bare NULL
    * literal (NullType generates a java.lang.Object-typed value).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    // Call the static forwarder `graft.functions.MergePatch.patchUtf8` that
    // scalac emits for a companion-less object. (`MergePatch.MODULE$` is NOT
    // valid Java — the singleton field lives on the `MergePatch$` class.)
    val cls = MergePatch.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        UTF8String ${ev.value} = $cls.patchUtf8(
          ${l.isNull} ? null : ((UTF8String) ${l.value}),
          ${r.isNull} ? null : ((UTF8String) ${r.value}));
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JsonMergePatch {
  /** Column API over the native expression. */
  def apply(curr: Column, prev: Column): Column =
    Bridge.column(
      JsonMergePatch(Bridge.expression(curr), Bridge.expression(prev)))

  /** SQL registration: `SELECT json_merge_patch(payload, previous)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_merge_patch", exprs => JsonMergePatch(exprs(0), exprs(1)), "scala_udf")
}
