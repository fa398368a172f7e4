package graft.dwd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Materialize.MatOps

/** DWD CDC routing layer: the reference's config-driven BaseDBApp2 +
  * TableProcessFunction — a MySQL `table_process` table maps
  * (source_table, operate_type) → (sink_type, sink_table, sink_columns)
  * and every CDC record is routed to Kafka (facts) or HBase (dims) with
  * its column set pruned to the configured CSV (reference
  * gmall-time/.../app/func/TableProcessFunction.java:178-237).
  *
  * Spark-first: the config is a driver-side map (it is tiny — the
  * reference polls it every 5 s); routing becomes one filtered,
  * column-pruned DataFrame per config row. Catalyst turns the pruning
  * into a narrowed parquet ReadSchema — the "manual column pruning" of
  * the reference is free here. At 100 TB each routed write is an
  * independent scan-project job with no shuffle at all.
  */
object DbRouter {
  /** (source_table, sink_type, sink_table, sink_columns CSV) —
    * the `table_process` schema (reference bean/TableProcess.java:11-30)
    * instantiated for the testdata star schema. */
  val config: Seq[(String, String, String, String)] = Seq(
    ("orders",   "kafka", "dwd_fact_orders",   "o_orderkey,o_custkey,o_totalprice"),
    ("lineitem", "kafka", "dwd_fact_lineitem", "l_orderkey,l_partkey,l_quantity,l_extendedprice"),
    ("customer", "hbase", "dim_customer",      "c_custkey,c_name,c_nationkey"),
    ("nation",   "hbase", "dim_nation",        "n_nationkey,n_name"),
    ("part",     "hbase", "dim_part",          "p_partkey,p_name,p_brand,p_type"),
    ("supplier", "hbase", "dim_supplier",      "s_suppkey,s_name,s_nationkey"))

  /** A routed, column-pruned frame per config row (the engine-side
    * analog of the Kafka/HBase fan-out). */
  def routed(spark: SparkSession, dir: String): Map[String, DataFrame] =
    config.map { case (src, _, sinkTable, cols) =>
      sinkTable -> Tables.read(spark, dir, src)
        .select(cols.split(",").map(col).toIndexedSeq: _*)
    }.toMap

  /** Oracle-checkable routing summary: one row per sink with the routed
    * row count — proves demux reached every sink with pruned columns. */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val counts = config.map { case (src, sinkType, sinkTable, cols) =>
      Tables.read(spark, dir, src)
        .select(cols.split(",").map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("row_ct"))
        .select(
          lit(sinkTable).as("sink_table"),
          lit(sinkType).as("sink_type"),
          lit(cols.split(",").length).cast("int").as("col_ct"),
          col("row_ct"))
    }
    counts.reduce(_.unionByName(_)).orderBy("sink_table")
  }

  /** One oracle builder for both routing summaries: per config row, a
    * SELECT of its sink name / pruned column count / source row count,
    * UNION ALL'd and ordered — kept in ONE place so a quoting or cast
    * fix cannot drift between [[oracle]] and [[dimAutoCreateOracle]]. */
  private def countOracle(rows: Seq[(String, String, String, String)],
      withSinkType: Boolean): String = rows.map {
    case (src, sinkType, sinkTable, cols) =>
      val st = if (withSinkType) s"'$sinkType' AS sink_type, " else ""
      s"""SELECT '$sinkTable' AS sink_table, $st
         |CAST(${cols.split(",").length} AS INTEGER) AS col_ct,
         |count(*) AS row_ct FROM $src""".stripMargin.replace("\n", " ")
  }.mkString("", " UNION ALL ", " ORDER BY sink_table")

  val oracle: String = countOracle(config, withSinkType = true)

  // ---- dim table auto-create (P6 tail) ----------------------------

  /** Idempotent dim auto-create — the reference's `checkTable` issues
    * `CREATE TABLE IF NOT EXISTS <sink_table>(cols varchar, pk varchar
    * primary key)` against Phoenix the first time the config routes a
    * dim record there (gmall-time/src/main/java/com/atguigu/gmall/
    * realtime/app/func/TableProcessFunction.java:126-175). Spark
    * analog: when `table` is absent from the catalog, create it EMPTY
    * with the routed schema (`limit 0` write — DDL only, no data job
    * beyond a schema commit); when present, no-op. Returns whether it
    * created — callers that must observe first-sight semantics can
    * assert on it. Unlike the reference (all-varchar Phoenix columns),
    * the routed parquet schema keeps source types — nothing here needs
    * the lowest-common-denominator cast.
    *
    * Concurrency: the reference's single `CREATE TABLE IF NOT EXISTS`
    * statement is atomic; catalog-check-then-save is not (TOCTOU). A
    * concurrent creator that wins the race surfaces as
    * TableAlreadyExists from `saveAsTable` — caught and reported as
    * `false` (someone ensured it), so two racing callers both see the
    * IF NOT EXISTS contract hold. */
  def ensureDimTable(spark: SparkSession, table: String,
      schemaOf: DataFrame): Boolean =
    if (spark.catalog.tableExists(table)) false
    else
      try {
        schemaOf.limit(0).write.format("parquet").saveAsTable(table)
        true
      } catch {
        case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
          false
        // some catalog paths surface a losing CREATE race as a generic
        // AnalysisException instead of the typed subclass — treat it as
        // "already exists" only when the catalog confirms, else rethrow
        case e: org.apache.spark.sql.AnalysisException =>
          if (spark.catalog.tableExists(table)) false else throw e
      }

  /** Driver-checkable auto-create round trip, one per routed `hbase`
    * dim: reset (cross-JVM re-runnability, same machinery as the
    * bucketed sink) → ensure (must create) → append the routed batch →
    * ensure again (must no-op — the IF NOT EXISTS contract) → read the
    * CATALOG table back and emit (sink_table, col_ct, row_ct). The
    * oracle recomputes the counts from the source tables, so a
    * mis-created schema, lost append, or non-idempotent ensure all
    * surface as a red row. */
  def dimAutoCreate(spark: SparkSession, dir: String): DataFrame = {
    val summaries = config.filter(_._2 == "hbase").map {
      case (src, _, sinkTable, cols) =>
        val table = s"graft_$sinkTable"
        graft.sinks.Sinks.resetManagedTable(spark, table)
        val frame = Tables.read(spark, dir, src)
          .select(cols.split(",").map(col).toIndexedSeq: _*)
        require(ensureDimTable(spark, table, frame),
          s"$table absent after reset — ensure must create it")
        frame.write.mode("append").format("parquet").saveAsTable(table)
        require(!ensureDimTable(spark, table, frame),
          s"$table exists — ensure must no-op, not recreate")
        spark.table(table).agg(count(lit(1)).as("row_ct"))
          .select(
            lit(sinkTable).as("sink_table"),
            lit(cols.split(",").length).cast("int").as("col_ct"),
            col("row_ct"))
    }
    summaries.reduce(_.unionByName(_)).orderBy("sink_table")
  }

  val dimAutoCreateOracle: String =
    countOracle(config.filter(_._2 == "hbase"), withSinkType = false)

  // ---- dim upsert (CDC update batch through the catalog path) -----

  /** The reference `DimSink.invoke` upsert analog over a catalog dim
    * table (gmall-time/.../app/func/DimSink.java:41-75 upserts each
    * CDC record by primary key): merge = keep-latest of
    * (current table ∪ batch) per key, overwritten in place. Unseen
    * keys insert, seen keys replace iff the batch row's ts wins — the
    * Phoenix UPSERT / ReplacingMergeTree contract
    * ([[graft.sinks.Sinks.dedupLatest]]), now composed with the
    * catalog tables [[ensureDimTable]] creates. `localCheckpoint`
    * materializes the current state eagerly so the overwrite does not
    * read from the table it replaces.
    *
    * Scale shape: one window shuffle on the pk over (table ∪ batch) —
    * and the batch is a CDC micro-batch, so the union is dominated by
    * the table scan; at 100 TB the dim tables this path serves are
    * the bounded ones (the reference stores them in Phoenix/HBase,
    * not the fact store). */
  def upsertDimTable(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String], tsCol: String): Unit = {
    ensureDimTable(spark, table, batch)
    val current = spark.table(table).matEagerly
    graft.sinks.Sinks.dedupLatest(current.unionByName(batch), keys, tsCol)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Driver-checkable upsert round trip: bootstrap-insert the customer
    * dim (ts 1000), then route one CDC update batch (ts 2000) carrying
    * BOTH flavors the reference's invoke handles — updates (every
    * c_custkey % 3 = 0 row, renamed payload) and inserts (brand-new
    * keys shifted by 10⁷) — and read the CATALOG table back. The
    * oracle recomputes the expected keep-latest state from the source
    * table, so a lost update, a dropped new key, a duplicated pk, or a
    * stale survivor all surface as a red row. */
  def dimUpsert(spark: SparkSession, dir: String): DataFrame = {
    val table = "graft_dim_customer_upsert"
    graft.sinks.Sinks.resetManagedTable(spark, table)
    val base = Tables.read(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"), col("c_nationkey"))
    val inserts = base.withColumn("ts", lit(1000L))
    require(ensureDimTable(spark, table, inserts),
      s"$table absent after reset — ensure must create it")
    inserts.write.mode("append").format("parquet").saveAsTable(table)
    val updates = base.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_name", concat(lit("u:"), col("c_name")))
      .unionByName(base.filter(col("c_custkey") % 5 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(lit("new:"), col("c_name")).as("c_name"),
          col("c_nationkey")))
      .withColumn("ts", lit(2000L))
    upsertDimTable(spark, table, updates, Seq("c_custkey"), "ts")
    spark.table(table)
  }

  val dimUpsertOracle: String =
    """SELECT c_custkey,
      |       CASE WHEN c_custkey % 3 = 0 THEN 'u:' || c_name ELSE c_name END AS c_name,
      |       c_nationkey,
      |       CAST(CASE WHEN c_custkey % 3 = 0 THEN 2000 ELSE 1000 END AS BIGINT) AS ts
      |FROM customer
      |UNION ALL
      |SELECT CAST(c_custkey + 10000000 AS BIGINT), 'new:' || c_name, c_nationkey,
      |       CAST(2000 AS BIGINT)
      |FROM customer WHERE c_custkey % 5 = 0""".stripMargin
}
