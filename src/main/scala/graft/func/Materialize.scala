package graft.func

import org.apache.spark.sql.Dataset

/** ONE policy switch for the engine's materialization barriers
  * (r20-VERDICT task 3). The optimization rounds cut repeated heavy
  * passes by materializing a shared intermediate once per invocation;
  * the device was `localCheckpoint`, which truncates lineage onto
  * EXECUTOR-LOCAL block storage — free and exactly right in local
  * mode, but a fault-tolerance trade on a cluster: lose one executor
  * mid-query and every consumer of the truncated lineage fails
  * unrecoverably instead of recomputing. At 100 TB with node churn
  * that is an availability regression no per-site comment can fix, so
  * the choice is hoisted to one conf:
  *
  *   spark.graft.materialize = local    (default) lazy/eager
  *                                      localCheckpoint — zero-copy,
  *                                      non-fault-tolerant
  *   spark.graft.materialize = reliable lazy/eager checkpoint() to the
  *                                      fault-tolerant checkpoint dir
  *                                      (set spark.checkpoint.dir or
  *                                      SparkContext.setCheckpointDir;
  *                                      HDFS/object store on a
  *                                      cluster)
  *
  * Every query-path materialization site routes through [[lazily]] /
  * [[eagerly]] (grep check in MaterializeSpec), so a cluster
  * deployment flips ONE conf instead of auditing forty call sites.
  * Both modes share the semantics the call sites rely on: the frame
  * is computed once per invocation, inside the caller's timed action
  * (lazy sites) — never across invocations or runs.
  */
object Materialize {
  /** Session conf selecting the barrier implementation. */
  val ModeConf = "spark.graft.materialize"

  private def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.conf.get(ModeConf, "local") match {
      case "local" => false
      case "reliable" => true
      case other => throw new IllegalArgumentException(
        s"$ModeConf=$other — expected 'local' or 'reliable'")
    }

  /** LAZY materialization barrier: the returned frame computes its
    * input ONCE on first action and every other consumer reads the
    * materialized copy — the shared-heavy-pass device. Lazy on
    * purpose: the work must land inside the caller's own timed
    * action, not at plan-construction time. */
  def lazily[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) ds.checkpoint(eager = false)
    else ds.localCheckpoint(eager = false)

  /** EAGER materialization barrier: computes now, returns the
    * lineage-truncated frame — the iterative-loop device (each round
    * pins its result so round n+1's plan does not contain rounds
    * 1..n). */
  def eagerly[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) ds.checkpoint(eager = true)
    else ds.localCheckpoint(eager = true)

  /** Postfix spelling, so call sites keep the fluent shape
    * (`df.select(...).matLazily` where `.localCheckpoint(false)`
    * stood). */
  implicit final class MatOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def matLazily: Dataset[T] = lazily(ds)
    def matEagerly: Dataset[T] = eagerly(ds)
  }
}
