package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector kernels for the similarity suite — the codegen'd form of
  * the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order chains, whose
  * lambda bodies evaluate interpreted per ELEMENT (Spark's higher-order
  * functions are `CodegenFallback`): for a 64-dim vector that is 64
  * interpreter round trips per dot product, and the hyperplane bucketing
  * takes 16 dot products per vector per table.
  *
  * Bit-identity contract (same as [[Hash60]]): the generated loop
  * accumulates LEFT TO RIGHT with one fused multiply-free `acc + a(i)*b(i)`
  * step — exactly the operand order of the higher-order chain it replaces —
  * so results are IEEE-identical and every DuckDB oracle
  * (`list_dot_product`-style CTE math) keeps matching. Property-tested
  * against the original formula including forced codegen.
  *
  * Inputs are dense `array<double>` vectors; arrays of different lengths
  * yield null (the zip_with chain yields null via its null padding —
  * matching that, not silently truncating, keeps the two forms
  * substitutable). A null ELEMENT likewise yields null — `aggregate` folds
  * `acc + null` to null, so the chain these kernels claim bit-identity with
  * returns null for sparse arrays, and a SQL caller must get the same
  * answer, not a garbage number from reading the slot as 0.0.
  */
abstract class DenseVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // these kernels can return null even for non-null inputs (length mismatch,
  // null element): without this override, two non-nullable array children
  // would make nullSafeCodeGen treat ev.isNull as the constant `false` and
  // the templates' `ev.isNull = true;` assignments would emit non-compiling
  // Java (codegen failure → interpreted fallback at best) — and the declared
  // contract would be wrong regardless
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> inputs, got $l / $r")
    }
}

/** dot(a, b) = Σ a_i·b_i, sequential. */
case class DoubleDot(left: Expression, right: Expression) extends DenseVectorBinary {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot(a,b) / sqrt(dot(a,a)·dot(b,b)) — the three sequential
  * accumulations fused into ONE pass over the arrays; each accumulator sees
  * exactly the operand sequence of its standalone loop, so the fusion is
  * bit-neutral while cutting the array traffic 3×.
  */
case class CosineSim(left: Expression, right: Expression) extends DenseVectorBinary {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val (xi, yi) = (x.getDouble(i), y.getDouble(i))
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / math.sqrt(aa * bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa"); val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $ab / java.lang.Math.sqrt($aa * $bb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2sq_micro(a, b) = floor(Σ (a_i − b_i)² · 1e6) as BIGINT — the integer
  * micro-unit squared-L2 kernel of the whole PQ family (encode argmin, ADC,
  * IVF routing). Replaces the interpreted
  * `floor(aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, _+_) · 1e6)`
  * chain, which paid a per-ELEMENT interpreter round trip × ksub codewords
  * × m subspaces per encoded row. Bit-identity contract: the loop computes
  * `d = a_i − b_i; acc += d·d` left to right — the exact operand order of
  * the lambda chain — then `(long) Math.floor(acc · 1e6)`, the same
  * double→long floor Spark's `Floor` performs; every PQ oracle's
  * `floor(... * 1000000)` stays exact. Null/length semantics mirror the
  * chain (null padding / acc + null): length mismatch or a null element
  * yields null.
  */
case class L2SqMicro(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_l2sq_micro"

  override def dataType: DataType = LongType

  // same null contract as DenseVectorBinary (see its nullable note): the
  // kernel yields null on length mismatch / null element even when both
  // children are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d; i += 1
    }
    java.lang.Math.floor(acc * 1.0e6).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
      val (acc, d) = (ctx.freshName("acc"), ctx.freshName("d"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = (long) java.lang.Math.floor($acc * 1.0E6);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vn = v / s elementwise — the codegen'd form of the normalization chain
  * `transform(v, x => x / nrm)` at the head of EVERY PQ/IVF/OPQ serve and of
  * the corpus-side encode (per corpus row, per query — 64 interpreted lambda
  * round trips each under the higher-order form). Bit-identity contract:
  * per-element IEEE division in array order, and the transform chain's exact
  * null algebra — a null ARRAY yields null, a null SCALAR yields an array of
  * null elements (transform applies the lambda per element; x / null is null
  * — NOT a null array), a null element stays a null element. The custom
  * doGenCode below exists precisely for that middle case, which
  * nullSafeCodeGen cannot express.
  */
case class VecDivScalar(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_div_scalar"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double>, double) inputs, got $l / $r")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val s = right.eval(input)
    VectorKernels.divScalar(v.asInstanceOf[ArrayData], s == null,
      if (s == null) 0.0 else s.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = VectorKernels.getClass.getName.stripSuffix("$")
    ev.copy(code =
      code"""
        ${l.code}
        boolean ${ev.isNull} = ${l.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${r.code}
          ${ev.value} = $cls.divScalar(${l.value}, ${r.isNull},
            ${r.isNull} ? 0.0 : ${r.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** a − b elementwise — the codegen'd form of the residual chain
  * `zip_with(vn, centroid, (x, c) => x − c)` (per probed candidate row in
  * residual IVF-PQ). Bit-identity contract: per-element IEEE subtraction in
  * array order, zip_with's exact null algebra — either array null ⇒ null
  * result; result length = max of the lengths with the shorter side
  * null-padded (⇒ null elements there); a null element stays null.
  */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_sub"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.sub($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static kernels for the array-returning expressions — companion-less
  * object for static forwarders (the [[WordBigramsKernel]] pattern): the
  * generated code makes ONE static call per row instead of one interpreter
  * round trip per element.
  */
object VectorKernels {
  def divScalar(v: ArrayData, sNull: Boolean, s: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!sNull && !v.isNullAt(i)) out(i) = v.getDouble(i) / s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sub(a: ArrayData, b: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.max(na, nb)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < na && i < nb && !a.isNullAt(i) && !b.isNullAt(i))
        out(i) = a.getDouble(i) - b.getDouble(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DoubleDot(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def l2sqMicro(a: Column, b: Column): Column =
    Bridge.column(L2SqMicro(Bridge.expression(a), Bridge.expression(b)))
  def divScalar(v: Column, s: Column): Column =
    Bridge.column(VecDivScalar(Bridge.expression(v), Bridge.expression(s)))
  def sub(a: Column, b: Column): Column =
    Bridge.column(VecSub(Bridge.expression(a), Bridge.expression(b)))
}
