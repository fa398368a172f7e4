package graft.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Exprs._
import graft.func.Tokenizer

/** DWS keyword stats (A6/A7 + U1/U2): the reference's two Flink SQL
  * jobs — `LATERAL TABLE(ik_analyze(fullword))` over search logs with a
  * tumbling count (gmall-time/.../app/dws2/KeywordStatspp.java:42-70),
  * and the keywordProductC2R UDTF exploding (click,cart,order) metric
  * triples into tagged rows
  * (gmall-time/.../app/func/KeywordProductC2RUDTF.java:11-35).
  *
  * Spark-first: both UDTFs are `explode` of pure expressions (no UDF,
  * codegen-friendly): tokenize→explode→hash aggregate for A6;
  * explode(array(struct(ct, source))) + filter(ct>0) for U2. The
  * aggregate is partial+final, so at 100 TB the shuffle carries one row
  * per (keyword) per map task, not per token.
  */
object KeywordStats {
  /** A6: tokenize document text, count per keyword, tag source=SEARCH
    * (the documents table is the fullword source, FIXTURES.md §B). */
  def apply(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(Tokenizer.explodeTokens(col("text")).as("keyword"))
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(col("keyword"), lit("SEARCH").as("source"), col("ct"))
      .orderBy("keyword")

  val oracle: String =
    """SELECT keyword, 'SEARCH' AS source, count(*) AS ct
      |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS keyword
      |      FROM documents)
      |WHERE keyword <> ''
      |GROUP BY keyword
      |ORDER BY keyword""".stripMargin

  /** A6 through the dictionary-shaped segmenter
    * ([[graft.func.DictTokenizer]]): forward-maximum-matching CJK path
    * with the SAME ASCII contract as [[graft.func.Tokenizer]], so on
    * this corpus the output — and therefore the oracle — is identical
    * to [[apply]] (a driver-decidable guard that the dict path does
    * not corrupt the ASCII contract; the CJK behavior itself is
    * spec-tested on synthetic strings). Typed flatMap by nature
    * (per-char dictionary scan); linear, zero shuffle before the
    * partial+final aggregate. */
  def dictForm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("text")).as[String]
      .flatMap(graft.func.DictTokenizer.segment)
      .toDF("keyword")
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(col("keyword"), lit("SEARCH").as("source"), col("ct"))
      .orderBy("keyword")
  }

  /** U2 + A7: per-sku metric triple exploded to (keyword, source, ct)
    * rows with ct > 0 — keyword = the sku dim's brand, sources CLICK /
    * CART / ORDER (constants GmallConstant.java:70-73). */
  def productC2R(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    // part scales linearly with sf (not a bounded dim) — no forced
    // broadcast; AQE picks broadcast-vs-shuffle from runtime sizes.
    val metrics = Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand").as("keyword"))
      .agg(
        count(lit(1)).as("click_ct"),
        sum(col("l_quantity").cast("long")).as("cart_ct"),
        countDistinct(col("l_orderkey")).as("order_ct"))

    metrics
      .select(col("keyword"), explode(array(
        struct(lit("CLICK").as("source"), col("click_ct").as("ct")),
        struct(lit("CART").as("source"), col("cart_ct").as("ct")),
        struct(lit("ORDER").as("source"), col("order_ct").as("ct")))).as("r"))
      .select(col("keyword"), col("r.source").as("source"), col("r.ct").as("ct"))
      .filter(col("ct") > 0)
      .orderBy("keyword", "source")
  }

  val productC2ROracle: String =
    """WITH m AS (
      |  SELECT p_brand AS keyword,
      |         count(*) AS click_ct,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cart_ct,
      |         count(DISTINCT l_orderkey) AS order_ct
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand)
      |SELECT keyword, source, ct FROM (
      |  SELECT keyword, 'CLICK' AS source, click_ct AS ct FROM m
      |  UNION ALL SELECT keyword, 'CART', cart_ct FROM m
      |  UNION ALL SELECT keyword, 'ORDER', order_ct FROM m)
      |WHERE ct > 0
      |ORDER BY keyword, source""".stripMargin
}
