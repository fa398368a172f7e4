package graft.dwd

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Nested behavior-log pipeline (P1/P5/A3): the reference's single
  * most-used input shape — the `ods_base_log` JSON with nested
  * `common`/`page`/`start` structs and a `displays[]` array (sample at
  * gmall-time/.../app/dwd2/BaseLogApp2.java:172-191; split logic
  * :118-157; displays explode with injected page_id :123-154, feeding
  * ProductStats' display metrics, app/dws2/ProductStatsApp.java:104-147).
  *
  * The testdata `events` table is flat, so the operator first RENDERS
  * each event as an A1-shaped JSON string (`to_json`) and then parses
  * it back with `from_json` against the full A1 StructType — the parse
  * path, null-tolerant schema-on-read, demux and explode are all real;
  * only the payload is synthesized (deterministically, so the DuckDB
  * oracle can state the expected output directly — the JSON round-trip
  * is an identity on the data).
  *
  * Scale: `from_json` + `explode` are narrow codegen'd operators — the
  * whole demux is one scan with zero shuffles; each derived stream is
  * a filter over the same parsed frame, which Catalyst prunes to the
  * columns that stream needs.
  */
object LogNested {
  /** FIXTURES.md §A1 StructType (the reference's log schema). */
  val LogSchema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("ar", StringType), StructField("ba", StringType),
      StructField("ch", StringType), StructField("is_new", StringType),
      StructField("md", StringType), StructField("mid", StringType),
      StructField("os", StringType), StructField("uid", StringType),
      StructField("vc", StringType)))),
    StructField("page", StructType(Seq(
      StructField("during_time", LongType),
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("source_type", StringType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("order", LongType),
      StructField("pos_id", LongType))))),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("action_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("ts", LongType))))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType),
      StructField("loading_time", LongType),
      StructField("open_ad_id", LongType),
      StructField("open_ad_ms", LongType),
      StructField("open_ad_skip_ms", LongType)))),
    StructField("ts", LongType)))

  /** One display entry for a FIXED index k — the k-dependent branches
    * collapse to literals at plan time, so the whole struct is a plain
    * codegen'd projection. */
  private def displayStruct(k: Int): Column = struct(
    lit(if (k % 2 == 1) "promo" else "query").as("display_type"),
    ((col("event_id") + k) % 200 + 1).cast("string").as("item"),
    lit(if (k % 2 == 1) "sku_id" else "activity_id").as("item_type"),
    lit(k.toLong).as("order"),
    lit(k + 1L).as("pos_id"))

  /** One action entry for a FIXED index k — same constant-folding
    * trick as displayStruct. Actions carry their own event-time ts
    * (page ts + k seconds), like the reference's actions[] elements
    * (BaseLogApp2.java:173). */
  private def actionStruct(k: Int): Column = struct(
    lit(if (k % 2 == 1) "cart_add" else "favor_add").as("action_id"),
    ((col("event_id") + 3 * k) % 200 + 1).cast("string").as("item"),
    lit("sku_id").as("item_type"),
    (unix_millis(col("ts")) + 1000L * k).as("ts"))

  /** Deterministic A1-shaped JSON for each event: signup events are
    * *start* logs, everything else a *page* log with `event_id % 3`
    * display entries (alternating sku/activity items) and
    * `(event_id+1) % 3` action entries. */
  private def renderJson: Column = {
    val isStart = col("event_type") === "signup"
    // event_id % 3 ∈ {0,1,2} entries: render both candidates as
    // constant-folded structs and slice the prefix. The previous
    // transform(sequence(...)) form ran as an INTERPRETED higher-order
    // function — the heaviest per-row expression in the whole suite
    // (and sequence(1,0) descends, needing an extra empty-array guard).
    val displays = slice(
      array(displayStruct(1), displayStruct(2)),
      lit(1), (col("event_id") % 3).cast("int"))
    val actions = slice(
      array(actionStruct(1), actionStruct(2)),
      lit(1), ((col("event_id") + 1) % 3).cast("int"))
    to_json(struct(
      struct(
        (col("user_id") % 10).cast("string").as("ar"),
        lit("Brand").as("ba"),
        col("event_type").as("ch"),
        lit("1").as("is_new"),
        lit("Model-1").as("md"),
        concat(lit("mid_"), col("user_id")).as("mid"),
        lit("os-13").as("os"),
        col("user_id").cast("string").as("uid"),
        lit("v2.1.132").as("vc")).as("common"),
      when(!isStart, struct(
        (col("value") * 1000).cast("long").as("during_time"),
        col("event_type").as("page_id"),
        when(col("event_id") % 2 === 0, lit("home")).as("last_page_id"),
        (col("event_id") % 200 + 1).cast("string").as("item"),
        lit("sku_id").as("item_type"),
        lit("query").as("source_type"))).as("page"),
      when(!isStart, displays).as("displays"),
      when(!isStart, actions).as("actions"),
      when(isStart, struct(
        lit("icon").as("entry"),
        coalesce(col("prop_k"), lit(0L)).as("loading_time"),
        (col("event_id") % 20).as("open_ad_id"),
        lit(9533L).as("open_ad_ms"),
        lit(2605L).as("open_ad_skip_ms"))).as("start"),
      unix_millis(col("ts")).as("ts")))
  }

  /** Rendered A1 log lines, materialized ONCE per (JVM, dir) to a temp
    * parquet and re-read thereafter. The render is FIXTURE synthesis —
    * production feeds these lines from a Kafka topic; they exist here
    * only because the testdata has no raw-JSON table — and generating
    * 1M lines per query charged every display/action/start query ~2 s
    * of fixture cost on the timed path (and was behind the round-2
    * 114 s bench stall). Materialized, the lines are a TABLE, like
    * `events.parquet`, and the `from_json` PARSE — the actual P1
    * operator — remains on every query's timed path. */
  private val renderedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def renderedLines(spark: SparkSession, dir: String): DataFrame = {
    val path = renderedDirs.computeIfAbsent(dir, { d =>
      val p = graft.func.TempDirs.scoped("graft_loglines")
      LogSplit.parsed(spark, d)
        .select(col("event_id"), renderJson.as("line"))
        .write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }

  /** Parsed nested frame — the real `from_json` schema-on-read step
    * (reference BaseLogApp2.java:63-69). */
  def parsed(spark: SparkSession, dir: String): DataFrame =
    renderedLines(spark, dir)
      .select(col("event_id"), from_json(col("line"), LogSchema).as("log"))

  /** P5 start/page demux over the parsed struct: one labelled row per
    * record (the reference's main-output/side-output split). */
  def startSplit(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir).select(
      col("event_id"),
      col("log.common.mid").as("mid"),
      when(col("log.start").isNotNull, "start").otherwise("page").as("stream"),
      col("log.page.page_id").as("page_id"),
      col("log.page.last_page_id").as("last_page_id"),
      col("log.start.entry").as("entry"),
      col("log.start.loading_time").as("loading_time"),
      col("log.ts").as("ts_ms"))

  val startSplitOracle: String =
    """SELECT event_id,
      |       'mid_' || user_id AS mid,
      |       CASE WHEN event_type = 'signup' THEN 'start' ELSE 'page' END AS stream,
      |       CASE WHEN event_type = 'signup' THEN NULL ELSE event_type END AS page_id,
      |       CASE WHEN event_type = 'signup' OR event_id % 2 <> 0 THEN NULL
      |            ELSE 'home' END AS last_page_id,
      |       CASE WHEN event_type = 'signup' THEN 'icon' END AS entry,
      |       CASE WHEN event_type = 'signup'
      |            THEN coalesce(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT), 0)
      |       END AS loading_time,
      |       epoch_ms(ts) AS ts_ms
      |FROM events""".stripMargin

  /** A3/P5: displays[] exploded with the parent page_id injected
    * (BaseLogApp2.java:123-154) — the display stream ProductStats
    * consumes. */
  def displayExplode(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(col("log.start").isNull)
      .select(
        col("event_id"),
        col("log.common.mid").as("mid"),
        col("log.page.page_id").as("page_id"),
        col("log.ts").as("ts_ms"),
        explode(col("log.displays")).as("d"))
      .select(
        col("event_id"), col("mid"), col("page_id"), col("ts_ms"),
        col("d.display_type").as("display_type"),
        col("d.item").as("item"),
        col("d.item_type").as("item_type"),
        col("d.order").as("ord"),
        col("d.pos_id").as("pos_id"))

  val displayExplodeOracle: String =
    """SELECT event_id,
      |       'mid_' || user_id AS mid,
      |       event_type AS page_id,
      |       epoch_ms(ts) AS ts_ms,
      |       CASE WHEN k % 2 = 1 THEN 'promo' ELSE 'query' END AS display_type,
      |       CAST((event_id + k) % 200 + 1 AS VARCHAR) AS item,
      |       CASE WHEN k % 2 = 1 THEN 'sku_id' ELSE 'activity_id' END AS item_type,
      |       k AS ord,
      |       k + 1 AS pos_id
      |FROM events, LATERAL (SELECT unnest(range(1, CAST(event_id % 3 AS INTEGER) + 1)) AS k) u
      |WHERE event_type <> 'signup'""".stripMargin

  /** P5 (second array): actions[] exploded with parent page context —
    * the reference's log carries BOTH displays[] and actions[]
    * (BaseLogApp2.java:173); same injected-parent-field explode, the
    * action's own ts kept as the event time. */
  def actionExplode(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(col("log.start").isNull)
      .select(
        col("event_id"),
        col("log.common.mid").as("mid"),
        col("log.page.page_id").as("page_id"),
        explode(col("log.actions")).as("a"))
      .select(
        col("event_id"), col("mid"), col("page_id"),
        col("a.action_id").as("action_id"),
        col("a.item").as("item"),
        col("a.item_type").as("item_type"),
        col("a.ts").as("action_ts"))

  val actionExplodeOracle: String =
    """SELECT event_id,
      |       'mid_' || user_id AS mid,
      |       event_type AS page_id,
      |       CASE WHEN k % 2 = 1 THEN 'cart_add' ELSE 'favor_add' END AS action_id,
      |       CAST((event_id + 3 * k) % 200 + 1 AS VARCHAR) AS item,
      |       'sku_id' AS item_type,
      |       epoch_ms(ts) + 1000 * k AS action_ts
      |FROM events, LATERAL (SELECT unnest(range(1, CAST((event_id + 1) % 3 AS INTEGER) + 1)) AS k) u
      |WHERE event_type <> 'signup'""".stripMargin

  /** A3 aggregate: display counts per displayed item (the click/display
    * extraction feeding ProductStats, ProductStatsApp.java:104-147) —
    * joined after aggregation, so the explode output never shuffles
    * with dim columns attached. */
  def displayStats(spark: SparkSession, dir: String): DataFrame =
    displayExplode(spark, dir)
      .filter(col("item_type") === "sku_id")
      .groupBy(col("item"))
      .agg(
        count(lit(1)).as("display_ct"),
        countDistinct(col("mid")).as("display_uv"))

  val displayStatsOracle: String =
    """WITH d AS (
      |  SELECT 'mid_' || user_id AS mid,
      |         CAST((event_id + k) % 200 + 1 AS VARCHAR) AS item,
      |         CASE WHEN k % 2 = 1 THEN 'sku_id' ELSE 'activity_id' END AS item_type
      |  FROM events, LATERAL (SELECT unnest(range(1, CAST(event_id % 3 AS INTEGER) + 1)) AS k) u
      |  WHERE event_type <> 'signup')
      |SELECT item, count(*) AS display_ct, count(DISTINCT mid) AS display_uv
      |FROM d WHERE item_type = 'sku_id'
      |GROUP BY item""".stripMargin
}
