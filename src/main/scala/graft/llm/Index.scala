package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.{OracleSql, Tokenizer}

/** Corpus-wide lexical index structures over `documents`: an inverted
  * index (token → document frequency + bounded posting-list head) and
  * an IDF-weighted rarity score per document — the retrieval-side
  * complement to the per-doc [[TextAnalysis]] stats (a training-data
  * pipeline needs both: postings for lexical lookup/decontamination,
  * rarity as a "how much low-frequency content" quality signal).
  *
  * Both are pure integer arithmetic (counts and ppm integer division;
  * IDF is the exact rational 1e6/df, not a logarithm) so every value
  * is bit-portable to the DuckDB oracle.
  */
object Index {
  /** Posting-list head length kept per token. The full posting list is
    * O(df) and for corpus-frequent tokens that is the corpus itself —
    * a per-key collect that cannot scale; the head is the bounded
    * artifact (the tip a lookup service would mmap first). */
  val PostingHead = 8

  private val toksSql = OracleSql.toks

  /** Inverted index: one row per distinct token with its document
    * frequency and the first [[PostingHead]] doc_ids (ascending,
    * comma-joined).
    *
    * Scale shape: ONE shuffle. The (token, doc_id) pairs are exploded
    * from distinct per-doc token sets (dedup happens inside the row,
    * before the shuffle), then a single hash-partition by token serves
    * both window frames — `count` over the partition for df and
    * `row_number` ordered by doc_id for the head — and the final
    * groupBy(token) reuses the same partitioning (no second exchange;
    * `collect_list` is bounded by the rn ≤ [[PostingHead]] filter
    * before it, never O(df)). */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexOf(Tables.documents(spark, dir))

  /** [[invertedIndex]] over any (doc_id, text) frame — public for tests. */
  def invertedIndexOf(docs: DataFrame): DataFrame = {
    val pairs = docs.select(col("doc_id"),
      explode(array_distinct(Tokenizer.tokens(col("text")))).as("token"))
    val byToken = Window.partitionBy("token")
    val ranked = pairs
      .withColumn("df", count(lit(1)).over(byToken))
      .withColumn("rn", row_number().over(byToken.orderBy("doc_id")))
    ranked.filter(col("rn") <= PostingHead)
      .groupBy("token")
      .agg(max("df").as("df"),
        concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string")))
          .as("head_postings"))
  }

  lazy val invertedIndexOracle: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |pairs AS (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t),
       |r AS (SELECT token, doc_id,
       |        CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df,
       |        row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
       |      FROM pairs)
       |SELECT token, max(df) AS df,
       |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS head_postings
       |FROM r WHERE rn <= $PostingHead GROUP BY token""".stripMargin

  /** IDF rarity score per document: over all token OCCURRENCES (not
    * types), sum the exact-rational inverse document frequency
    * `1e6 DIV df` and normalize by token count — high when a document
    * is built from corpus-rare vocabulary, low for stopword soup. The
    * integer-DIV IDF keeps the score hash-exact where `ln(N/df)`
    * would be transcendental and engine-dependent.
    *
    * Scale shape: the df table is vocabulary-sized — broadcast it;
    * the occurrence stream then never shuffles on token, only the
    * final per-doc aggregate shuffles (and map-side combines) on
    * doc_id. Docs with zero tokens survive via the left join with
    * null score. */
  def idfRarity(spark: SparkSession, dir: String): DataFrame =
    idfRarityOf(Tables.documents(spark, dir))

  /** [[idfRarity]] over any (doc_id, text) frame — public for tests. */
  def idfRarityOf(docs: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(Tokenizer.tokens(col("text"))).as("token"))
    val dfs = exploded.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val scored = exploded.join(broadcast(dfs), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("1000000 DIV df")).as("idf_sum"))
      .withColumn("rarity_ppm", expr("idf_sum DIV n_tokens"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("idf_sum"), col("rarity_ppm"))
  }

  lazy val idfRarityOracle: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |ex AS (SELECT doc_id, unnest(toks) AS token FROM t),
       |dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df
       |        FROM (SELECT DISTINCT doc_id, token FROM ex) GROUP BY 1),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |              CAST(sum(1000000 // df) AS BIGINT) AS idf_sum
       |       FROM ex JOIN dfs USING (token) GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       |       idf_sum, idf_sum // n_tokens AS rarity_ppm
       |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin
}
