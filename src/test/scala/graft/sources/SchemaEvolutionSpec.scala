package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("merged read backfills the pre-evolution column as NULL") {
    val out = SchemaEvolution.schemaEvolution(spark, Sf).collect()
    val byGen = out.groupBy(_.getLong(0))
    // gen 1 predates event_type: everything lands under _missing_
    assert(byGen(1L).map(_.getString(1)).toSet === Set("_missing_"))
    assert(byGen(2L).map(_.getString(1)).toSet.size > 1)
    assert(!byGen(2L).map(_.getString(1)).contains("_missing_"),
      "gen 2 always carries the column")
    // conservation across the merged read
    val events = spark.read.parquet(s"$Sf/events.parquet")
    assert(out.map(_.getLong(2)).sum === events.count())
    assert(out.map(_.getLong(3)).sum ===
      events.agg(sum("user_id")).head().getLong(0))
  }

  test("generation pruning: a gen filter reaches the partition scan") {
    val path = SchemaEvolution.evoDir(spark, Sf)
    val plan = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("gen") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("gen"),
      s"the gen predicate must prune at the file listing, not post-scan:\n$plan")
  }
}
