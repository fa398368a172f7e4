package graft.expr

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnShim

/** Registration surface for graft's native expressions.
  *
  *  - Column API: [[vecDot]] / [[vecNorm]] wrap the expressions for
  *    DataFrame code.
  *  - SQL API: [[GraftExtensions]] injects `vec_dot` / `vec_norm` via
  *    `SparkSessionExtensions` (for sessions built with
  *    `spark.sql.extensions=graft.expr.GraftExtensions`);
  *    [[GraftFunctions.install]] registers the same functions into an
  *    already-running session (tests, notebooks).
  */
object GraftFunctions {
  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  def vecNorm(a: Column): Column =
    ColumnShim.column(VecNorm(ColumnShim.expression(a)))

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (c: Seq[Expression]) => VecDot(c(0), c(1))),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (c: Seq[Expression]) => VecNorm(c(0))))

  /** Register into a live session's function registry. */
  def install(spark: SparkSession): Unit = functions.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  private[expr] def injected: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = functions
}

/** `spark.sql.extensions` entry point: the native functions plus the
  * as-of join's planner strategy and pushdown/pruning rule
  * ([[graft.plans.NativeAsOf.install]] is the live-session retrofit of
  * the same pair). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injected.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinOptimization)
  }
}
