package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.Tables
import graft.func.TempDirs

/** CSV file source with corrupt-record accounting — completes the
  * ingest-format family (parquet tables, [[JsonLines]], the socket
  * line stream): the same schema-on-read + PERMISSIVE corrupt-column
  * contract, exercised through Spark's Univocity CSV parser instead
  * of Jackson.
  *
  * Fixture discipline mirrors [[JsonLines]]: the events table is
  * rendered to comma-joined lines with a DETERMINISTIC corruption —
  * event_id ≡ 0 mod [[JsonLines.CorruptEvery]] ships with a stray
  * extra field, the wrong-token-count class an unescaped-delimiter
  * export produces. (Chosen over a bad-cast mangle deliberately:
  * Spark 4's Univocity PERMISSIVE path nulls a failed field cast
  * WITHOUT setting `_corrupt_record` — only token-count mismatches
  * are flagged.) Render and mangle are pure projections the oracle
  * replays from the parquet table, so the accounting is hash-exact
  * without DuckDB reading the CSV files.
  *
  * Scale shape (100 TB): partition-local text write, parallel text
  * scan + per-line parse inside the scan stage, ONE map-side-combined
  * aggregate of |event_type|+1 rows. Corrupt rows cost the same as
  * clean ones — no exception path. */
object CsvLines {
  /** The materialized CSV directory for `dir`'s events table —
    * cached per (JVM, dir) like the other fixture sinks. */
  def csvDir(spark: SparkSession, dir: String): String = {
    val out = TempDirs.cachedFor("csvlines", dir)
    Tables.events(spark, dir)
      .select(col("event_id"),
        concat_ws(",", col("event_id"), col("user_id"), col("event_type"))
          .as("l"))
      .select(when(col("event_id") % JsonLines.CorruptEvery === 0L,
          concat(col("l"), lit(",junk"))).otherwise(col("l")).as("l"))
      .write.mode("overwrite").text(out)
    out
  }

  /** Parse the CSV directory back under the declared schema and
    * account per event type; rows mangled with an extra token (wrong
    * token count — the only corruption Univocity PERMISSIVE flags,
    * see the object comment) aggregate under `_corrupt_`. Output:
    * (event_type, n_rows, user_sum) — the same contract as
    * [[JsonLines.jsonRoundtrip]]. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = csvDir(spark, dir)
    val schema = StructType(Seq(
      StructField("event_id", org.apache.spark.sql.types.LongType),
      StructField("user_id", org.apache.spark.sql.types.LongType),
      StructField("event_type", StringType),
      StructField("_corrupt_record", StringType)))
    // with CSV column pruning (default on) Univocity parses only the
    // projected fields, so a stray extra token is never even read and
    // the row is silently "clean" — the corrupt contract needs the
    // full-row parse. Disabled PER-READ via the CSVOptions
    // "columnPruning" key (Spark 4) instead of mutating the session
    // conf, which would have turned pruning off for every later CSV
    // read in the session (review r10).
    spark.read
      .schema(schema)
      .option("columnPruning", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .select(
        when(col("_corrupt_record").isNotNull, "_corrupt_")
          .otherwise(col("event_type")).as("event_type"),
        col("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("event_type") =!= "_corrupt_", col("user_id")))
          .as("user_sum"))
  }

  /** Same replay rule as the JSON oracle: an event parses iff its id
    * is not ≡ 0 mod CorruptEvery; corrupt rows contribute one
    * `_corrupt_` row with NULL user_sum. */
  lazy val csvRoundtripOracle: String = JsonLines.jsonRoundtripOracle
}
