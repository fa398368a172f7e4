package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OrcEventsSpec extends SparkSpec {
  import spark.implicits._

  test("orc roundtrip equals the same slice computed from parquet") {
    val viaOrc = OrcEvents.orcRoundtrip(spark, Sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val viaParquet = graft.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull &&
        col("user_id") <= OrcEvents.UserCap)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("s"),
        max("event_id").as("m"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaOrc === viaParquet)
    assert(viaOrc.nonEmpty, "vacuous fixture — cap excludes every user")
  }

  test("orc scan gets pushdown and pruning, same as parquet") {
    val q = OrcEvents.orcRoundtrip(spark, Sf)
    q.queryExecution.toRdd.count()
    val plan = q.queryExecution.executedPlan.toString
    // no path-substring fallback: the fixture dir name contains "orc",
    // which would make a weaker assert vacuously true
    assert(plan.contains("Format: ORC"),
      s"expected an ORC scan:\n$plan")
    // the range predicate must reach the file scan, not evaluate
    // post-scan only
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("LessThanOrEqual(user_id,"),
      s"user_id cap must push into the ORC scan:\n$plan")
    // column pruning: the ts column is never referenced and must not
    // be read ([<,]ts: matches the field at any schema position)
    val readSchema = "ReadSchema: \\S+".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.nonEmpty && !"[<,]ts:".r.unanchored.matches(readSchema),
      s"unreferenced columns must prune from the ORC ReadSchema: $readSchema")
  }
}
