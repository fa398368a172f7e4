package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.TempDirs

/** Schema-evolution read — the ops reality of any long-lived corpus:
  * early shards were written before a column existed, later shards
  * carry it, and one read must serve both. Spark-first: parquet
  * `mergeSchema` unions the per-file footers into one schema (old
  * rows surface the new column as NULL), and the `gen=N` directory
  * layout doubles as a discovered partition column — so generation
  * pruning is free (`WHERE gen = 2` never opens gen=1 files).
  *
  * Fixture: the events table split into two "generations" — gen 1
  * (even event_id) written WITHOUT `event_type`, gen 2 (odd) with it.
  * The split rule is a pure projection the oracle replays from the
  * parquet table, so the accounting is hash-exact without DuckDB
  * reading the evolved files.
  *
  * Scale shape (100 TB): footer merge happens once at planning;
  * reading stays a parallel columnar scan (the missing column is
  * materialized as NULL per row group, not read), and the accounting
  * aggregate map-side combines to (gen × event_type) rows. */
object SchemaEvolution {
  /** The two-generation parquet layout for `dir`'s events table —
    * cached per (JVM, dir) like the other fixture sinks. */
  def evoDir(spark: SparkSession, dir: String): String = {
    val out = TempDirs.cachedFor("schemaevo", dir)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    ev.filter(col("event_id") % 2 =!= 0)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    out
  }

  /** Merged-schema accounting: per (generation, event_type) — with
    * pre-evolution rows under `_missing_` — the row count and user
    * sum. Exercises footer merge, NULL backfill, and the discovered
    * partition column in one read. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val path = evoDir(spark, dir)
    spark.read.option("mergeSchema", "true").parquet(path)
      .select(col("gen").cast("long").as("gen"),
        // _missing_ labels the PRE-EVOLUTION generation only — a
        // genuinely-NULL gen-2 value must stay NULL (the oracle's
        // CASE is gen-keyed, and a blanket coalesce would diverge)
        when(col("gen") === 1, lit("_missing_"))
          .otherwise(col("event_type")).as("event_type"),
        col("user_id"))
      .groupBy("gen", "event_type")
      .agg(count(lit(1)).as("n_rows"), sum("user_id").as("user_sum"))
  }

  lazy val schemaEvolutionOracle: String =
    s"""WITH ev AS (
       |  SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS gen,
       |         CASE WHEN event_id % 2 = 0 THEN '_missing_'
       |              ELSE event_type END AS event_type,
       |         user_id
       |  FROM events)
       |SELECT CAST(gen AS BIGINT) AS gen, event_type,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(user_id) AS BIGINT) AS user_sum
       |FROM ev GROUP BY 1, 2""".stripMargin
}
