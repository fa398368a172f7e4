package graft.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Exprs._

/** DWS visitor stats (A1): the reference unions four per-stream
  * projections of `VisitorStats` counters (pv/uv/sv/uj + dwell time),
  * keys by (ar, ch, vc, is_new) and incrementally reduces in a 10 s
  * tumbling event-time window (reference
  * gmall-time/.../app/dws2/VisitorStatsApp.java:97-244; we implement
  * the *intended* semantics — its reducer forgets uj_ct and its sv
  * filter is inverted, see SURVEY.md §2.6).
  *
  * Spark-first: the union of per-stream counter projections becomes
  * per-row conditional counters over ONE scan (`when(...)`), so the
  * "4-way union" costs nothing; the window reduce is a single partial+
  * final hash aggregate on the (window, dims) key. uv/sv/uj flags are
  * computed with analytic windows first (one shuffle on mid), then
  * aggregated (second shuffle on the low-cardinality stat key) — the
  * same two-exchange shape Flink's keyBy→keyBy pipeline has, but with
  * map-side combine on the second.
  */
object VisitorStats {
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val byMid = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // whole-partition min for the T1-repaired is_new flag — same
    // partitioning key as byMid, so Catalyst reuses the one shuffle
    val overMid = Window.partitionBy(col("user_id"))

    // ONE window pass: the daily-unique flag is "previous event (by ts,
    // within mid) fell on an earlier day", which the same lag that
    // drives sv/uj already provides — the earlier row_number() over
    // (mid, day) cost a second hash-shuffle + sort for the same answer.
    val flagged = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byMid))
      .withColumn("prev_day", lag(to_date(col("ts")), 1).over(byMid))
      .withColumn("next_ms", lead(col("ts_ms"), 1).over(byMid))
      // per-event counters (the reference's 4 projected streams):
      .withColumn("pv", lit(1L))                                   // page view
      .withColumn("uv", when(col("prev_day").isNull ||
        col("prev_day") < to_date(col("ts")), 1L).otherwise(0L))   // daily unique
      .withColumn("sv", when(col("prev_ms").isNull ||
        col("ts_ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L)) // session start
      .withColumn("uj", when((col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > 1800000L) &&
          (col("next_ms").isNull ||
          col("next_ms") - col("ts_ms") > 1800000L), 1L).otherwise(0L)) // bounce

    // the reference keys by the FOUR dims (ar, ch, vc, is_new) —
    // VisitorStatsApp.java:201-211; is_new is the T1-repaired flag
    // (1 only on the user's first active day), vc a low-cardinality
    // version-code stand-in
    flagged
      .withColumn("first_day", min(to_date(col("ts"))).over(overMid))
      .groupBy(
        tumbleStart(col("ts"), 10).as("stt"),
        (col("user_id") % 10).as("ar"),           // area dim stand-in
        col("event_type").as("ch"),               // channel dim stand-in
        concat(lit("v2."), col("user_id") % 3).as("vc"),
        when(to_date(col("ts")) === col("first_day"), 1)
          .otherwise(0).cast("int").as("is_new"))
      .agg(
        sum(col("pv")).as("pv_ct"),
        sum(col("uv")).as("uv_ct"),
        sum(col("sv")).as("sv_ct"),
        sum(col("uj")).as("uj_ct"),
        sumCents(col("value")).as("dur_sum_cents"))
  }

  val oracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, value, ts,
      |         epoch_ms(ts) AS ts_ms,
      |         lag(epoch_ms(ts)) OVER w AS prev_ms,
      |         lead(epoch_ms(ts)) OVER w AS next_ms,
      |         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                            ORDER BY ts, event_id) AS day_rn,
      |         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_day
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS stt,
      |       user_id % 10 AS ar,
      |       event_type AS ch,
      |       'v2.' || CAST(user_id % 3 AS VARCHAR) AS vc,
      |       CAST(CASE WHEN CAST(ts AS DATE) = first_day THEN 1 ELSE 0 END AS INTEGER) AS is_new,
      |       count(*) AS pv_ct,
      |       CAST(sum(CASE WHEN day_rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uv_ct,
      |       CAST(sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |                THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
      |       CAST(sum(CASE WHEN (prev_ms IS NULL OR ts_ms - prev_ms > 1800000)
      |                 AND (next_ms IS NULL OR next_ms - ts_ms > 1800000)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct,
      |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dur_sum_cents
      |FROM flagged
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin

  /** Hopping (sliding) window size / slide in seconds. */
  val HopSizeSec = 3600L
  val HopSlideSec = 1800L

  /** A1's window family completed: HOPPING windows (size 1 h, slide
    * 30 min) — each event lands in size/slide = 2 overlapping
    * windows, the smoothing the reference's Flink stack offers via
    * `SlidingEventTimeWindows` but the app never enables (it tumbles
    * only — VisitorStatsApp.java:213). Spark's `window(ts, size,
    * slide)` compiles the multi-assignment to an internal explode, so
    * one groupBy serves all overlapping windows; counts are exact
    * (countDistinct → two-phase partial aggregate, no expand
    * explosion at 2 windows/event).
    *
    * Scale shape (100 TB): fan-out is a fixed ×(size/slide) = ×2
    * BEFORE the map-side combine collapses to (window, type) groups
    * bounded by calendar × |types| — the shuffle moves group rows,
    * not event rows. The oracle replays the window assignment as
    * explicit slide-aligned starts: floor(t/slide)·slide and its
    * predecessor. */
  def hopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), s"$HopSizeSec seconds",
        s"$HopSlideSec seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"),
        countDistinct("user_id").as("uv_ct"))
      .select(unix_timestamp(col("w.start")).cast("long").as("stt"),
        col("event_type"), col("pv_ct"), col("uv_ct"))

  val hoppingOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |         unnest([(epoch_ms(ts) // 1000 // $HopSlideSec) * $HopSlideSec,
       |                 (epoch_ms(ts) // 1000 // $HopSlideSec) * $HopSlideSec
       |                   - $HopSlideSec]) AS stt
       |  FROM events)
       |SELECT CAST(stt AS BIGINT) AS stt, event_type,
       |       CAST(count(*) AS BIGINT) AS pv_ct,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS uv_ct
       |FROM ev GROUP BY 1, 2""".stripMargin
}
