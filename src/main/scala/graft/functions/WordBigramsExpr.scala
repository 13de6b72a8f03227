package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-bigram expression — the codegen'd form of
  * `zip_with(slice(split(text, " "), 1, n-1), slice(..., 2, n-1), concat)`
  * used by the Gopher repetition gate, the corpus-filter flagship, and the
  * bigram-LM scorers: the higher-order chain splits the text, materializes
  * two slice copies, and runs an interpreted concat lambda per bigram.
  *
  * Bit-identity contract (same discipline as [[Hash60]]/[[VectorExprs]]):
  * tokenization replicates Spark's `split(text, " ")` EXACTLY — the pattern
  * is a regex that matches one literal ASCII space, with limit -1, so empty
  * tokens between consecutive spaces AND at both ends are kept ("a  b" →
  * ["a", "", "b"] → bigrams ["a ", " b"]). Fewer than two tokens yields an
  * empty array, exactly like the n-1-length zip of the original. Bigrams are
  * `token[i] + " " + token[i+1]` byte-concatenation — identical strings, so
  * every downstream hash/count/oracle is unchanged. Property-tested against
  * the original formula (incl. forced codegen, multi-space and unicode
  * inputs).
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_bigrams expects a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordBigramsKernel.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordBigramsKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.bigrams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[WordBigrams]] — companion-less object for static forwarders. */
object WordBigramsKernel {

  private val SPACE = UTF8String.fromString(" ")

  def bigrams(text: UTF8String): GenericArrayData = {
    // UTF8String.split with limit -1 is exactly what the `split` SQL
    // function runs for a single-space pattern (regex " " has no
    // metacharacters), so token boundaries — including kept empties — are
    // identical by construction
    val toks = text.split(SPACE, -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(toks(i), SPACE, toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def bigrams(c: Column): Column = Bridge.column(WordBigrams(Bridge.expression(c)))
}
