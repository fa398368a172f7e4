package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.OracleSql

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) over
  * the corpus — the real merge loop, not a stand-in: per round, count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere, repeat. [[MergeRounds]] is fixed so the
  * derivation is restatable as chained SQL (one CTE block per round)
  * and every output hash-checks.
  *
  * Scale shape: the corpus is touched ONCE — the word-frequency
  * aggregate (one shuffle, map-side combined). Every merge round runs
  * on the distinct-WORD vocabulary (bounded: vocabulary-sized, not
  * corpus-sized), so the loop's per-round cost is independent of
  * corpus size; the argmax per round is a 1-row driver collect
  * (coordination, same class as the closure loop's moved-count).
  *
  * Determinism: ties on pair frequency break lexicographically; the
  * merge application is string `replace` on a space-delimited symbol
  * form, iterated [[ReplacePasses]] times to reach the left-to-right
  * greedy fixpoint (a single non-overlapping replace pass misses
  * merges whose boundary space was consumed by the previous match —
  * " a b a b " needs a second pass; both engines iterate identically).
  *
  * Production vocab sizes (32k–256k merges): the per-merge driver
  * round-trip here (1-row argmax collect per round) is the
  * oracle-checkable form, NOT the 32k-merge form — 32k sequential
  * 1-row jobs would be pure coordination latency. The scale path
  * BATCHES rounds: collect the top-B non-interacting pairs per argmax
  * (pairs are "interacting" iff they share a symbol or one's merged
  * token is the other's element — a driver-side check over B² symbol
  * pairs, B ≈ 256), apply all B merges in one distributed pass, and
  * re-count. Non-interacting merges commute with the greedy order, so
  * batching preserves the learned table exactly while cutting driver
  * round-trips from V to ~V/B; SentencePiece's unigram trainer and
  * fastBPE use the same batching argument. Per-round cost stays
  * vocabulary-sized either way — the corpus is still touched once.
  */
object Bpe {
  val MergeRounds = 3

  /** First-occurrence replace passes per merge. Each pass splices out
    * exactly the LEFTMOST " a b " occurrence, which is precisely the
    * greedy left-to-right BPE application when iterated: merging the
    * leftmost pair can never create a match EARLIER than itself (the
    * merged symbol "ab" is not the pair's right element), so repeated
    * leftmost-merge ≡ one greedy scan. A whole-string replace would
    * NOT be: its non-overlapping scan strands the middle of
    * same-symbol runs (" a a a a a " → [aa, a, aa], greedy is
    * [aa, aa, a]). A word of S symbols needs ≤ S/2 passes; 8 covers
    * the guard's 16-symbol bound — longer corpus words must raise
    * this in BOTH engines. */
  val ReplacePasses = 8

  /** End-of-word marker — keeps a word-final symbol distinct from the
    * same characters word-internal (the standard BPE device). */
  val Eow = "</w>"

  /** (word, n) corpus word frequencies — the only corpus-wide pass. */
  private def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(graft.func.Tokenizer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Canonical segmentation string: symbols space-joined with leading
    * and trailing spaces, so " a b " matches exactly one adjacent
    * symbol pair. */
  private val initSyms =
    concat(lit(" "),
      concat_ws(" ", expr("regexp_extract_all(word, '(.)', 1)")),
      lit(s" $Eow "))

  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("a", split(trim(col("syms")), " "))
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(a) - 1), " +
          "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")).as("pair"))
      .groupBy("pair").agg(sum(col("n")).as("freq"))

  /** The learned merge table plus the final segmentation — shared
    * derivation for both queries. Returns (merges, final vocab). */
  private def learn(docs: DataFrame): (Seq[(Int, String, Long)], DataFrame) = {
    var vocab = wordVocab(docs).withColumn("syms", initSyms)
      .localCheckpoint() // bounded (distinct words); pins the loop input
    // the ReplacePasses fixpoint bound assumes ≤ 2·passes symbols per
    // word (char count + eow marker); a longer word would MISS merges
    // silently and desync from the oracle — fail loudly instead
    val tooLong = vocab
      .filter(length(col("word")) + 1 > 2 * ReplacePasses).count()
    require(tooLong == 0,
      s"$tooLong corpus words exceed ${2 * ReplacePasses - 1} chars — " +
        s"raise ReplacePasses in BOTH engines (Bpe.scala + oracle)")
    val merges = (1 to MergeRounds).map { r =>
      val rows = pairCounts(vocab)
        .orderBy(col("freq").desc, col("pair")).limit(1).collect()
      require(rows.nonEmpty,
        s"BPE round $r found no adjacent pairs — corpus too small for " +
          s"MergeRounds=$MergeRounds")
      val row = rows.head
      val (pair, freq) = (row.getString(0), row.getLong(1))
      val merged = pair.replace(" ", "")
      val pat = s" $pair "
      // one leftmost-occurrence splice per pass — greedy BPE; see
      // [[ReplacePasses]] for why whole-string replace would be wrong.
      // One withColumn per pass keeps each pass's 3 references to the
      // string as ATTRIBUTE references (plan depth 8), not a 3^8
      // nested expression tree.
      def leftmostOnce(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val p = call_function("instr", c, lit(pat))
        when(p === 0, c).otherwise(concat(
          call_function("substring", c, lit(1), p - 1),
          lit(s" $merged "),
          call_function("substring", c, p + lit(pat.length), lit(Int.MaxValue))))
      }
      vocab = (1 to ReplacePasses)
        .foldLeft(vocab)((df, _) => df.withColumn("syms", leftmostOnce(col("syms"))))
        .localCheckpoint()
      (r, pair, freq)
    }
    (merges, vocab)
  }

  /** The merge table: (rank, pair, freq) — which pairs BPE learned, in
    * order, with their corpus-weighted frequencies. */
  def merges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (m, _) = learn(Tables.documents(spark, dir))
    m.toDF("rank", "pair", "freq")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("freq"))
  }

  /** The symbol vocabulary after [[MergeRounds]] merges: every symbol
    * with its corpus-weighted frequency — the artifact a tokenizer
    * loads. Any wrong merge anywhere changes this table, so its hash
    * check adjudicates the whole loop. */
  def vocab(spark: SparkSession, dir: String): DataFrame = {
    val (_, seg) = learn(Tables.documents(spark, dir))
    seg.withColumn("a", split(trim(col("syms")), " "))
      .select(col("n"), explode(col("a")).as("symbol"))
      .groupBy("symbol").agg(sum(col("n")).as("freq"))
  }

  /** Apply the learned merges back to the corpus: per document, the
    * word count and the BPE token count under the induced vocabulary —
    * the number a packing/pricing pass would bill. The segmented word
    * table IS the final loop state (vocabulary-bounded → broadcast);
    * the corpus-side work is one explode + broadcast join + per-doc
    * aggregate. */
  def tokenize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, seg) = learn(docs)
    val segmented = seg.select(col("word"),
      size(split(trim(col("syms")), " ")).cast("long").as("n_syms"))
    val perDoc = docs
      .select(col("doc_id"), explode(graft.func.Tokenizer.tokens(col("text"))).as("word"))
      .join(broadcast(segmented), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        col("n_bpe_tokens"))
  }

  // ---- oracle ------------------------------------------------------

  /** One leftmost-occurrence splice as SQL — the engine-equal twin of
    * the Spark pass (strpos ≡ instr, both 1-based). Emitted as ONE
    * line: this text is re-interpolated into outer stripMargin blocks,
    * which would eat a line-leading `||` operator as margin pipes. */
  private def spliceSql(from: String, to: String): String =
    s"CASE WHEN strpos(syms, $from) = 0 THEN syms " +
      s"ELSE substr(syms, 1, strpos(syms, $from) - 1) || $to || " +
      s"substr(syms, strpos(syms, $from) + len($from)) END"

  /** One merge round as SQL: seg<k> -> (p<k> pair counts, m<k> argmax,
    * one CTE per leftmost-splice pass, seg<k> = the last pass). The
    * argmax pair enters the passes as scalar subqueries, so the SQL
    * derives the merges itself — nothing is spliced from the Spark
    * run. One MATERIALIZED CTE per pass keeps the text linear where a
    * nested CASE (3 self-references per level) would be 3^passes. */
  private def roundSql(k: Int): String = {
    val prev = s"seg${k - 1}"
    val search = s"(' ' || (SELECT pair FROM m$k) || ' ')"
    val replc = s"(' ' || (SELECT replace(pair, ' ', '') FROM m$k) || ' ')"
    val passes = (1 to ReplacePasses).map { p =>
      val src = if (p == 1) prev else s"s${k}_p${p - 1}"
      s"""s${k}_p$p AS MATERIALIZED (SELECT word, n,
         |  ${spliceSql(search, replc)} AS syms FROM $src)""".stripMargin
    }.mkString(",\n")
    s"""p$k AS MATERIALIZED (SELECT pair, CAST(sum(n) AS BIGINT) AS freq FROM (
       |  SELECT n, unnest(list_transform(range(1, len(a)),
       |                   i -> a[i] || ' ' || a[i + 1])) AS pair
       |  FROM (SELECT n, string_split(trim(syms), ' ') AS a FROM $prev)
       |) GROUP BY pair),
       |m$k AS MATERIALIZED (SELECT pair, freq FROM p$k ORDER BY freq DESC, pair LIMIT 1),
       |$passes,
       |seg$k AS MATERIALIZED (SELECT word, n, syms FROM s${k}_p$ReplacePasses)""".stripMargin
  }

  private lazy val derivationSql: String = {
    val toks = OracleSql.toks
    val rounds = (1 to MergeRounds).map(roundSql).mkString(",\n")
    s"""WITH wv AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest($toks) AS word FROM documents) GROUP BY word),
       |seg0 AS MATERIALIZED (SELECT word, n,
       |  ' ' || array_to_string(regexp_extract_all(word, '(.)', 1), ' ')
       |      || ' $Eow ' AS syms FROM wv),
       |$rounds""".stripMargin
  }

  lazy val mergesOracle: String =
    derivationSql + "\n" +
      (1 to MergeRounds)
        .map(k => s"SELECT CAST($k AS INTEGER) AS rank, pair, freq FROM m$k")
        .mkString("", "\nUNION ALL\n", "")

  lazy val vocabOracle: String =
    derivationSql +
      s"""
         |SELECT symbol, CAST(sum(n) AS BIGINT) AS freq FROM (
         |  SELECT n, unnest(string_split(trim(syms), ' ')) AS symbol
         |  FROM seg$MergeRounds)
         |GROUP BY symbol""".stripMargin

  lazy val tokenizeOracle: String =
    derivationSql +
      s"""
         |SELECT d.doc_id, coalesce(x.n_words, CAST(0 AS BIGINT)) AS n_words,
         |       x.n_bpe_tokens
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(len(string_split(trim(syms), ' '))) AS BIGINT) AS n_bpe_tokens
         |  FROM (SELECT doc_id, unnest(${OracleSql.toks}) AS word FROM documents) e
         |  JOIN seg$MergeRounds USING (word)
         |  GROUP BY doc_id) x USING (doc_id)""".stripMargin

  /** Per-language tokenizer fertility — BPE tokens per word in
    * millionths, the number a tokenizer owner compares across
    * languages to spot under-served scripts (high fertility = the
    * vocabulary splinters that language). Same learned segmentation
    * as [[tokenize]]; the aggregate key space is langs, so the final
    * shuffle carries a handful of rows per map task.
    *
    * Scale shape: the segmented-word table is vocabulary-bounded —
    * broadcast; the corpus side is one explode + broadcast join; the
    * 1e6 scaling stays exact under Long to 10¹² BPE tokens per
    * language. */
  def fertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, seg) = learn(docs)
    val segmented = seg.select(col("word"),
      size(split(trim(col("syms")), " ")).cast("long").as("n_syms"))
    docs
      .select(col("lang"),
        explode(graft.func.Tokenizer.tokens(col("text"))).as("word"))
      .join(broadcast(segmented), Seq("word"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
      .withColumn("fertility_ppm",
        expr("(1000000 * n_bpe_tokens) DIV n_words"))
  }

  lazy val fertilityOracle: String =
    derivationSql +
      s"""
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(len(string_split(trim(syms), ' '))) AS BIGINT) AS n_bpe_tokens,
         |       CAST((1000000 * sum(len(string_split(trim(syms), ' '))))
         |            // count(*) AS BIGINT) AS fertility_ppm
         |FROM (SELECT lang, unnest(${OracleSql.toks}) AS word FROM documents) e
         |JOIN seg$MergeRounds USING (word)
         |GROUP BY lang""".stripMargin
}
