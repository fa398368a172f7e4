package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.func.Exprs

/** Logical as-of join node — the whole-operator custom-plan tier
  * ((c) in SURVEY.md §7.4's escalation order): a first-class
  * `LogicalPlan` the optimizer can rewrite around, planned by
  * [[AsOfJoinStrategy]] into [[AsOfJoinExec]]'s single merge pass.
  *
  * Output contract: every `left` row, with `payload` columns from the
  * latest `right` row whose time is at-or-before the left row's time
  * within the same key (all null when none precedes it) — identical to
  * [[graft.operators.AsOf.asOf]], which remains the
  * composition-tier form of the same operator and is the parity oracle
  * for this one.
  *
  * A custom node is an OPTIMIZER BARRIER by default: Catalyst's
  * pushdown/pruning rules only fire on node classes they know, so a
  * filter above this node — or the node's own habit of demanding every
  * child column — would keep the parquet scans fat at 100 TB.
  * [[AsOfJoinOptimization]] restores both properties explicitly.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** One output row per left row. */
  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** The two optimizations Catalyst cannot apply through an unknown
  * node, restated for [[AsOfJoinPlan]]:
  *
  *  1. Filter pushdown — a deterministic predicate over left columns
  *     commutes with the join (left-preserving, one output row per
  *     left row), so it moves below the node where `FileSourceStrategy`
  *     can fold it into the scan's `PushedFilters`. Predicates touching
  *     payload columns stay above (they observe the join result).
  *  2. Column pruning — a Project above the node shrinks the node's
  *     demand: unused payload columns leave the payload list, and each
  *     child is cut to (referenced ∪ key ∪ time), narrowing the scan's
  *     `ReadSchema`.
  *
  * Both rewrites fire only when they strictly shrink something, so the
  * rule is a fixpoint no-op on its own output.
  */
object AsOfJoinOptimization extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(_, j: AsOfJoinPlan) =>
      val needed = p.references
      val newPayload = j.payload.filter(needed.contains)
      val leftNeeded = j.left.output.filter(a =>
        needed.contains(a) || a.semanticEquals(j.leftKey) ||
          a.semanticEquals(j.leftTime))
      val rightNeeded = j.right.output.filter(a =>
        newPayload.exists(_.semanticEquals(a)) ||
          a.semanticEquals(j.rightKey) || a.semanticEquals(j.rightTime))
      val shrinks = newPayload.size < j.payload.size ||
        leftNeeded.size < j.left.output.size ||
        rightNeeded.size < j.right.output.size
      if (!shrinks) p
      else p.copy(child = j.copy(
        left = if (leftNeeded.size < j.left.output.size)
          Project(leftNeeded, j.left) else j.left,
        right = if (rightNeeded.size < j.right.output.size)
          Project(rightNeeded, j.right) else j.right,
        payload = newPayload))
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.payload, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Construction + registration surface for the native as-of join —
  * the same dual surface as [[graft.expr.GraftFunctions]]:
  * `spark.sql.extensions=graft.expr.GraftExtensions` injects the
  * strategy and rule at session build, [[install]] retrofits a live
  * session through the public `experimental` hooks (idempotent;
  * [[asOf]] calls it on construction, so the
  * `q_asof_latest_order_native` board entry plans the node under the
  * driver's plain sessions too).
  */
object NativeAsOf {
  def install(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(AsOfJoinOptimization))
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfJoinOptimization
  }

  /** Native as-of join over DataFrames; same signature and contract as
    * [[graft.operators.AsOf.asOf]] (LONG key/time; ties match; right
    * null key/time never match). */
  def asOf(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    install(spark)
    require(payload.forall(c => !left.columns.contains(c)),
      s"payload ${payload.mkString(",")} collides with left columns")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n not found in ${p.output.map(_.name)}"))
    val (lk, lt) = (attr(lPlan, leftKey), attr(lPlan, leftTime))
    val (rk, rt) = (attr(rPlan, rightKey), attr(rPlan, rightTime))
    Seq(lk, lt, rk, rt).foreach(a => require(a.dataType == LongType,
      s"as-of key/time ${a.name} must be LONG, got ${a.dataType}"))
    PlanShim.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
        payload.map(attr(rPlan, _))))
  }

  /** [[graft.operators.AsOf.latestOrderQuery]] on the native operator —
    * same inputs, same output columns, same DuckDB oracle
    * ([[graft.operators.AsOf.latestOrderOracle]]). */
  def latestOrderQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      Exprs.epochMs(col("ts")).as("ts_ms"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        Exprs.epochMs(col("o_orderdate")).as("o_date_ms"),
        col("o_orderkey"))
      .groupBy("o_custkey", "o_date_ms")
      .agg(max("o_orderkey").as("o_orderkey"))
    asOf(spark, ev, ord, "user_id", "o_custkey", "ts_ms", "o_date_ms",
      Seq("o_orderkey", "o_date_ms"))
      .withColumn("days_since",
        when(col("o_date_ms").isNotNull,
          expr("(ts_ms - o_date_ms) DIV 86400000")))
  }
}
