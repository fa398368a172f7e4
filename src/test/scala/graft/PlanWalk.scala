package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared walkers for layout/plan assertions — ONE copy of each so
  * suites cannot diverge on skip rules or AQE descent (r16/r17 review
  * findings: the walkers had grown hand copies across suites). */
object PlanWalk {
  /** Data files under a directory tree (skips `_`/`.` bookkeeping
    * files — every layout assertion must share these skip rules). */
  def dataFiles(d: java.io.File): Seq[java.io.File] =
    Option(d.listFiles).toSeq.flatten.flatMap {
      case f if f.isDirectory => dataFiles(f)
      case f if !f.getName.startsWith("_") && !f.getName.startsWith(".") =>
        Seq(f)
      case _ => Nil
    }

  /** Every FileSourceScanExec in an executed plan. `children` does
    * not descend into AQE's materialized stages (QueryStageExec has
    * no children) — recurse explicitly. */
  def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case s: QueryStageExec => allScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  /** Every node of an executed plan, same AQE descent as
    * [[allScans]] — for assertions that must locate a node RELATIVE
    * to another (e.g. a runtime filter above a specific scan). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case s: QueryStageExec => s +: allNodes(s.plan)
    case other => other +: other.children.flatMap(allNodes)
  }
}
