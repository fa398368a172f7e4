package graft.func

import org.apache.spark.sql.SparkSession

/** ONE copy of the SQL-conf save/set/try/restore idiom (r18 review:
  * it had re-grown three hand copies across ScaleRehearsal, the
  * star query, and the lake spec after the r17 consolidation —
  * hoisted to shared main code this time so specs can use it too). */
object Confs {
  /** Run `body` with SQL confs set, restoring priors afterwards.
    * getOption, not get: an optional conf with no default (e.g.
    * spark.sql.adaptive.autoBroadcastJoinThreshold) reads as None
    * and must be UNSET on restore, not set(null). */
  def withSqlConfs[A](spark: SparkSession)(
      kvs: (String, String)*)(body: => A): A = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    // the sets live INSIDE the try: a throwing set (static conf,
    // validated value) must still restore the prefix already applied,
    // or the partial confs leak into the shared session (r18 review)
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
