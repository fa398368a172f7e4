package graft.dwd

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** DWD behavior-log layer: the reference's BaseLogApp2 — JSON parse,
  * three-way demux (page / start / display side outputs) and the
  * new-visitor flag repair (reference
  * gmall-time/.../app/dwd2/BaseLogApp2.java:63-157, repair :73-113).
  *
  * The `events` table stands in for the log stream (FIXTURES.md §B):
  * `user_id` ↔ device id `mid`, `event_type` ↔ page/start shape,
  * `props` ↔ the nested JSON payload.
  *
  * Spark-first: the three side outputs are three filters over ONE
  * parsed DataFrame — Catalyst pushes each filter to the parquet scan,
  * so there is no triple read and no driver-side routing. The stateful
  * keyed repair (Flink ValueState per mid) becomes a min-over-window:
  * a single hash-partitioned window pass, no per-key state at all.
  */
object LogSplit {
  /** Per-mid first-seen date — the repair state (ValueState in the
    * reference) expressed as an analytic function. */
  private def firstSeenDate: Column =
    min(to_date(col("ts"))).over(Window.partitionBy(col("user_id")))

  /** Parsed log with JSON payload field extracted (P1). regexp_extract
    * keeps the whole pipeline inside whole-stage codegen. A damaged
    * payload must not die: try_cast NULLs every malformed extract —
    * the '' a non-matching pattern yields AND digit runs that overflow
    * BIGINT — exactly like the oracle's TRY_CAST, where the previous
    * empty-string-only guard still aborted under ANSI on overflow. */
  def parsed(spark: SparkSession, dir: String): DataFrame = {
    val raw = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    Tables.events(spark, dir).withColumn("prop_k", raw.try_cast("long"))
  }

  /** P5 three-way demux as a single labelled frame: page / start / err
    * streams (reference side outputs, BaseLogApp2.java:118-157).
    * `action` events keep their own label like the displays[] explode. */
  def demux(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .withColumn("stream",
        when(col("event_type") === "signup", "start")
          .when(col("event_type") === "error", "err")
          .when(col("event_type").isin("view", "click"), "page")
          .otherwise("action"))
      .select(
        col("event_id"),
        col("user_id").as("mid"),
        col("stream"),
        col("event_type").as("page_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("prop_k"))

  val demuxOracle: String =
    """SELECT event_id,
      |       user_id AS mid,
      |       CASE WHEN event_type = 'signup' THEN 'start'
      |            WHEN event_type = 'error' THEN 'err'
      |            WHEN event_type IN ('view','click') THEN 'page'
      |            ELSE 'action' END AS stream,
      |       event_type AS page_id,
      |       epoch_ms(ts) AS ts_ms,
      |       TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS prop_k
      |FROM events""".stripMargin

  /** T1 new/old-visitor flag repair: is_new = 1 only on the mid's first
    * calendar day (the reference records first-visit date in keyed state
    * and rewrites later is_new=1 claims to 0; its v2 accidentally
    * discards the repaired stream — we implement the intended
    * semantics, BaseLogApp2.java:73-113). */
  def isNewRepair(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("user_id").as("mid"),
        to_date(col("ts")).cast("string").as("dt"),
        when(to_date(col("ts")) === firstSeenDate, 1).otherwise(0)
          .cast("int").as("is_new"))

  val isNewRepairOracle: String =
    """SELECT event_id,
      |       user_id AS mid,
      |       CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
      |       CAST(CASE WHEN CAST(ts AS DATE) =
      |                      min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
      |                 THEN 1 ELSE 0 END AS INTEGER) AS is_new
      |FROM events""".stripMargin
}
