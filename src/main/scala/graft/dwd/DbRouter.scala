package graft.dwd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  val oracle: String = config.map { case (src, sinkType, sinkTable, cols) =>
    s"""SELECT '$sinkTable' AS sink_table, '$sinkType' AS sink_type,
       |CAST(${cols.split(",").length} AS INTEGER) AS col_ct,
       |count(*) AS row_ct FROM $src""".stripMargin.replace("\n", " ")
  }.mkString("", " UNION ALL ", " ORDER BY sink_table")
}
