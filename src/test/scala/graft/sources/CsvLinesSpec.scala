package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CsvLinesSpec extends SparkSpec {
  import spark.implicits._

  test("csv roundtrip: parsed + corrupt rows account for every line") {
    val out = CsvLines.csvRoundtrip(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val events = spark.read.parquet(s"$Sf/events.parquet")
    val total = events.count()
    assert(out.values.map(_.getLong(1)).sum === total,
      "no line lost or double-counted")
    val expectedCorrupt = events
      .filter(col("event_id") % JsonLines.CorruptEvery === 0).count()
    assert(out("_corrupt_").getLong(1) === expectedCorrupt,
      "every extra-token line lands in the corrupt channel")
    assert(out("_corrupt_").isNullAt(2),
      "corrupt rows contribute no user mass")
    // a clean type's user_sum matches the parquet-side recompute
    val clean = events
      .filter(col("event_id") % JsonLines.CorruptEvery =!= 0)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)), sum("user_id")).head()
    assert(out("click").getLong(1) === clean.getLong(0))
    assert(out("click").getLong(2) === clean.getLong(1))
  }

  test("csv roundtrip leaves session CSV column pruning untouched") {
    // the full-row-parse requirement is satisfied per-read via the
    // CSVOptions "columnPruning" key, NOT by mutating the session
    // conf — later CSV reads in the same session must still prune
    val key = "spark.sql.csv.parser.columnPruning.enabled"
    val before = spark.conf.get(key)
    assert(CsvLines.csvRoundtrip(spark, Sf).count() > 0L)
    assert(spark.conf.get(key) === before,
      "csvRoundtrip must not mutate the session pruning conf")
    assert(before === "true", "default pruning stays on for the session")
  }

  test("csv roundtrip plan: no shuffle before the accounting aggregate") {
    val plan = CsvLines.csvRoundtrip(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"csv parse must reach the aggregate with at most one exchange:\n$plan")
  }
}
