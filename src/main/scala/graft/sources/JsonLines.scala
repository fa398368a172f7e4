package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.Tables
import graft.func.TempDirs

/** JSON-lines file source with corrupt-record accounting — the S2
  * ingest shape when the behavior log arrives as files instead of a
  * topic (reference `ods_base_log` carries JSON strings;
  * BaseLogApp2.java:74-90 routes unparseable lines to a dirty-data
  * side output). Spark-first: `spark.read.schema(...).json` in
  * PERMISSIVE mode parses schema-on-read and lands malformed lines in
  * `_corrupt_record` — the side-output contract as a COLUMN, no UDF,
  * no custom source.
  *
  * The sandbox has no JSON corpus, so the source material is the
  * events table round-tripped through `to_json` with a DETERMINISTIC
  * corruption (event_id ≡ 0 mod [[CorruptEvery]] loses its closing
  * brace — the truncated-line class a log shipper produces on
  * rotation). Both the render and the mangle rule are pure
  * projections the oracle replays from the parquet table, so parsed
  * counts are hash-exact without DuckDB ever reading the JSON files.
  *
  * Scale shape (100 TB): writing is a partition-local text sink;
  * reading is a parallel text scan + per-line JSON parse inside
  * codegen (JacksonParser), no shuffle until the accounting
  * aggregate — which map-side combines to |event_type|+1 rows. The
  * parse cost is the scan cost; corrupt rows cost the same as clean
  * ones (no exception path). */
object JsonLines {
  /** Every Nth event (by id) ships truncated. */
  val CorruptEvery = 50L

  /** The materialized JSON-lines directory for `dir`'s events table —
    * cached per (JVM, dir) like the other fixture sinks. */
  def jsonDir(spark: SparkSession, dir: String): String = {
    val out = TempDirs.cachedFor("jsonlines", dir)
    val line = to_json(struct(col("event_id"), col("user_id"),
      col("event_type"), col("value")))
    Tables.events(spark, dir)
      .select(col("event_id"), line.as("l"))
      .select(when(col("event_id") % CorruptEvery === 0L,
        expr("substring(l, 1, length(l) - 1)")).otherwise(col("l")).as("l"))
      .write.mode("overwrite").text(out)
    out
  }

  /** Parse the JSON-lines directory back under the declared schema and
    * account per event type; corrupt lines aggregate under the
    * `_corrupt_` type. Output: (event_type, n_rows, user_sum). */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = jsonDir(spark, dir)
    val schema = StructType(Seq(
      StructField("event_id", org.apache.spark.sql.types.LongType),
      StructField("user_id", org.apache.spark.sql.types.LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType),
      StructField("_corrupt_record", StringType)))
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .select(
        when(col("_corrupt_record").isNotNull, "_corrupt_")
          .otherwise(col("event_type")).as("event_type"),
        col("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("event_type") =!= "_corrupt_", col("user_id")))
          .as("user_sum"))
  }

  /** The oracle replays render+mangle+parse semantics from the parquet
    * table: an event parses iff its id is not ≡ 0 mod
    * [[CorruptEvery]]; corrupt lines contribute one `_corrupt_` row
    * with NULL user_sum (PERMISSIVE keeps other fields NULL on
    * corrupt lines). */
  lazy val jsonRoundtripOracle: String =
    s"""WITH ev AS (
       |  SELECT CASE WHEN event_id % $CorruptEvery = 0 THEN '_corrupt_'
       |              ELSE event_type END AS event_type,
       |         CASE WHEN event_id % $CorruptEvery = 0 THEN NULL
       |              ELSE user_id END AS u
       |  FROM events)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(u) AS BIGINT) AS user_sum
       |FROM ev GROUP BY 1""".stripMargin
}
