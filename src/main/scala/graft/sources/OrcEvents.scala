package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.TempDirs

/** ORC file source — the third columnar leg of the ingest-format
  * family (parquet tables, [[CsvLines]], [[JsonLines]], the socket
  * stream). Spark ships the ORC reader natively (no connector), and
  * the point under test is FORMAT-INDEPENDENCE of the scan
  * optimizations: the same predicate pushdown + column pruning the
  * parquet scans get must reach the ORC scan (`PushedFilters`, pruned
  * `ReadSchema` — both plan-asserted in OrcEventsSpec), so switching a
  * 100 TB lake between the two columnar formats does not change the
  * query shapes, only the file codec.
  *
  * Fixture discipline as [[CsvLines]]: the events table renders into
  * a per-(JVM, dir) cached PATH — overwrite-mode, so bench reps
  * re-write the same directory (timing includes the write, exactly
  * like the CSV/JSON legs) without accumulating files; the read-back query
  * filters and aggregates, and the oracle replays the same arithmetic
  * from the parquet table — hash-exact without DuckDB reading ORC. */
object OrcEvents {
  /** Pushdown-able slice bound (covers ~half the user domain at any
    * sf, so both the kept and pruned sides are non-trivial). */
  val UserCap = 500L

  /** The materialized ORC directory for `dir`'s events table. */
  def orcDir(spark: SparkSession, dir: String): String = {
    val out = TempDirs.cachedFor("orcevents", dir)
    Tables.events(spark, dir)
      .write.mode("overwrite").orc(out)
    out
  }

  /** Read the ORC directory back, slice on the pushdown-able range
    * predicate, and account per event type. Output: (event_type,
    * n_rows, user_sum, max_event) — [[CsvLines.csvRoundtrip]]'s
    * contract plus a max so pruning keeps three data columns. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(orcDir(spark, dir))
      .filter(col("user_id").isNotNull && col("user_id") <= UserCap)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("user_id")).as("user_sum"),
        max(col("event_id")).as("max_event"))

  /** The oracle replays the slice from the parquet table — the
    * roundtrip through ORC must be value-exact. */
  lazy val orcRoundtripOracle: String =
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(user_id) AS BIGINT) AS user_sum,
       |       max(event_id) AS max_event
       |FROM events
       |WHERE user_id IS NOT NULL AND user_id <= $UserCap
       |GROUP BY 1""".stripMargin
}
