package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot paths.
  *
  * Why custom expressions (SURVEY §4 said "none needed" — this is the
  * one exception found by profiling): composing built-ins for a 64-dim
  * dot product yields either an interpreted higher-order-function fold
  * (~40 µs/row off the codegen path) or a 64-term unrolled tree whose
  * generated source blows up quadratically with vector width (the
  * 32-plane signature variant cost ~20 s of janino compilation). A
  * `doGenCode` that emits a plain counted loop is compact, JIT-friendly
  * and width-independent.
  *
  * IEEE contract: ascending-index left fold with a 0.0 accumulator —
  * bit-identical to the unrolled `element_at` chain and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, ...))`, so results remain
  * hash-comparable. Asserted by tests against [[graft.llm.Similarity.dot]].
  *
  * Input contract (enforced, not silently papered over): arrays must be
  * equal-length with non-null elements — length mismatch raises
  * IllegalArgumentException, a null element raises NPE. The null check
  * is only *generated* when the schema's `containsNull` admits nulls,
  * so clean schemas keep the bare multiply-add loop.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.isNumericArray(left.dataType) &&
        VecExprs.isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, " +
        s"got ${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  @transient private lazy val leftFloat = VecExprs.isFloatArray(left.dataType)
  @transient private lazy val rightFloat = VecExprs.isFloatArray(right.dataType)
  // null-element checks are emitted ONLY when the schema admits null
  // elements, so the hot loop on clean (containsNull=false) schemas
  // stays a bare multiply-add
  @transient private lazy val leftNullable = VecExprs.elemNullable(left.dataType)
  @transient private lazy val rightNullable = VecExprs.elemNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw VecExprs.lengthMismatch(prettyName, n, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((leftNullable && x.isNullAt(i)) || (rightNullable && y.isNullAt(i)))
        throw VecExprs.nullElement(prettyName, i)
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val gx = VecExprs.elemJava(x, i, leftFloat)
      val gy = VecExprs.elemJava(y, i, rightFloat)
      val nullGuard =
        if (leftNullable || rightNullable) {
          val checks = Seq(
            if (leftNullable) Some(s"$x.isNullAt($i)") else None,
            if (rightNullable) Some(s"$y.isNullAt($i)") else None).flatten
          s"""if (${checks.mkString(" || ")}) {
             |    throw graft.expr.VecExprs.nullElement("$prettyName", $i);
             |  }""".stripMargin
        } else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw graft.expr.VecExprs.lengthMismatch(
         |    "$prettyName", $n, $y.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += $gx * $gy;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same fold contract as [[VecDot]]. */
case class VecNorm(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  @transient private lazy val childFloat = VecExprs.isFloatArray(child.dataType)
  @transient private lazy val childNullable = VecExprs.elemNullable(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (childNullable && x.isNullAt(i))
        throw VecExprs.nullElement(prettyName, i)
      val v = if (childFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val nullGuard =
        if (childNullable)
          s"""if ($x.isNullAt($i)) {
             |    throw graft.expr.VecExprs.nullElement("$prettyName", $i);
             |  }""".stripMargin
        else ""
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  double $v = ${VecExprs.elemJava(x, i, childFloat)};
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Shared helpers for the vector expressions. */
object VecExprs {
  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def elemNullable(t: DataType): Boolean = t match {
    case ArrayType(_, n) => n
    case _ => true
  }
  /** Java source for element i of array variable x, as double. */
  def elemJava(x: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"

  // shared by interpreted eval and generated code (must be public for
  // janino-compiled classes to call)
  def lengthMismatch(fn: String, n1: Int, n2: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"$fn requires equal-length arrays, got $n1 and $n2 elements")
  def nullElement(fn: String, i: Int): NullPointerException =
    new NullPointerException(
      s"$fn: null array element at index $i (elements must be non-null)")
}
