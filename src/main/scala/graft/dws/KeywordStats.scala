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
      |FROM (SELECT unnest(string_split_regex(translate(text,
      |        'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
      |        '[^a-z0-9]+')) AS keyword
      |      FROM documents)
      |WHERE keyword <> ''
      |GROUP BY keyword
      |ORDER BY keyword""".stripMargin

  /** A6 through the dictionary-shaped segmenter
    * ([[graft.func.DictTokenizer]]): forward-maximum-matching CJK path
    * with the SAME ASCII contract as [[graft.func.Tokenizer]]. Typed
    * flatMap by nature (per-char dictionary scan); linear, zero
    * shuffle before the partial+final aggregate. Oracle: since r13
    * [[dictOracle]] replays the FULL algorithm — ASCII translate-split
    * UNION a recursive-CTE forward-maximum-match over each CJK run
    * (longest-word-first probes, one per lexicon word length) with
    * the gaps-and-islands overlapping-bigram fallback — so the CJK
    * path is hash-checked too, not just the ASCII subset. */
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

  /** [[dictForm]]'s oracle — the whole DictTokenizer contract in SQL.
    * `fmm` marches each CJK run left-to-right: the LONGEST lexicon
    * word starting at position i wins (one LEFT JOIN per word length
    * present in the lexicon, longest coalesced first — the r13
    * self-review caught a bigram-only draft diverging on the 3-char
    * 关键词), emits, and advances by its length; anything else marks
    * i unmatched and advances 1. Unmatched islands (consecutive
    * positions, found with the pos − row_number device) fall back to
    * overlapping bigrams, a single leftover char to itself — exactly
    * DictTokenizer.segmentCjkRun. */
  lazy val dictOracle: String = {
    val lex = graft.func.DictTokenizer.Lexicon.toSeq.sorted
      .map(w => s"('$w')").mkString(", ")
    // one probe per word length, longest first (forward MAXIMUM match)
    val lens = graft.func.DictTokenizer.Lexicon.map(_.length)
      .toSeq.distinct.sorted.reverse
    val probes = lens.map(l =>
      s"LEFT JOIN lex l$l ON length(l$l.w) = $l AND " +
        s"l$l.w = substr(f.run, CAST(f.i AS INTEGER), $l)").mkString("\n  ")
    val hit = lens.map(l => s"l$l.w").mkString("coalesce(", ", ", ")")
    val advance = lens.map(l =>
      s"WHEN l$l.w IS NOT NULL THEN f.i + $l").mkString(" ")
    val up = graft.func.Tokenizer.Uppers
    val lo = graft.func.Tokenizer.Lowers
    s"""WITH RECURSIVE ascii_toks AS (
       |  SELECT unnest(string_split_regex(translate(text, '$up', '$lo'),
       |           '[^a-z0-9]+')) AS keyword
       |  FROM documents),
       |lex(w) AS (VALUES $lex),
       |runs AS (
       |  SELECT doc_id, rid, run FROM (
       |    SELECT doc_id,
       |           unnest(regexp_extract_all(text,
       |             '[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]+')) AS run,
       |           generate_subscripts(regexp_extract_all(text,
       |             '[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]+'), 1) AS rid
       |    FROM documents)
       |  WHERE length(run) > 0),
       |fmm AS (
       |  SELECT doc_id, rid, run, CAST(1 AS BIGINT) AS i,
       |         CAST(NULL AS VARCHAR) AS tok, CAST(NULL AS BIGINT) AS upos
       |  FROM runs
       |  UNION ALL
       |  SELECT f.doc_id, f.rid, f.run,
       |         CASE $advance ELSE f.i + 1 END,
       |         $hit,
       |         CASE WHEN $hit IS NULL THEN f.i END
       |  FROM fmm f
       |  $probes
       |  WHERE f.i <= length(f.run)),
       |upositions AS (
       |  SELECT doc_id, rid, run, upos,
       |         upos - row_number() OVER (PARTITION BY doc_id, rid
       |                                   ORDER BY upos) AS grp
       |  FROM fmm WHERE upos IS NOT NULL),
       |islands AS (
       |  SELECT doc_id, rid, run, grp, min(upos) AS a, max(upos) AS b,
       |         count(*) AS len
       |  FROM upositions GROUP BY doc_id, rid, run, grp),
       |all_toks AS (
       |  SELECT keyword FROM ascii_toks WHERE keyword <> ''
       |  UNION ALL
       |  SELECT tok AS keyword FROM fmm WHERE tok IS NOT NULL
       |  UNION ALL
       |  SELECT CASE WHEN len = 1 THEN substr(run, CAST(a AS INTEGER), 1)
       |              ELSE substr(run, CAST(k AS INTEGER), 2) END AS keyword
       |  FROM islands, LATERAL (SELECT unnest(range(a,
       |         CASE WHEN len = 1 THEN a + 1 ELSE b END)) AS k) u)
       |SELECT keyword, 'SEARCH' AS source, count(*) AS ct
       |FROM all_toks
       |GROUP BY keyword
       |ORDER BY keyword""".stripMargin
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
