package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.OracleSql
import graft.func.Materialize.MatOps

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) over
  * the corpus — the real merge loop, not a stand-in, in its BATCHED
  * form: per round, count adjacent symbol pairs weighted by word
  * frequency, select the LOCALLY-DOMINANT pairs (a pair is selected
  * iff no higher-ranked pair — (freq desc, pair asc) order —
  * interacts with it), and apply the whole batch in one distributed
  * pass. Two pairs "interact" iff they share a symbol or one's merged
  * token is an element of the other; a dominant set is therefore
  * mutually non-interacting, so all of a word's match sites are
  * disjoint and batch application commutes — both engines reach the
  * same segmentation in any order. The global argmax is always
  * dominant, so every round makes at least the progress of the
  * one-merge-at-a-time loop; this is the fastBPE/SentencePiece
  * batching argument, with dominance instead of a sequential greedy
  * walk so the SAME selection is one declarative predicate in DuckDB
  * (NOT EXISTS over the candidate top-[[CandCap]]) and a
  * [[CandCap]]²-cheap driver check in Spark.
  *
  * Scale shape: the corpus is touched ONCE — the word-frequency
  * aggregate (one shuffle, map-side combined). Every merge round runs
  * on the distinct-WORD vocabulary (bounded: vocabulary-sized, not
  * corpus-sized), so the loop's per-round cost is independent of
  * corpus size; per round the driver collects only the top-[[CandCap]]
  * candidate rows (TakeOrderedAndProject) — [[MergeRounds]] driver
  * round-trips for up to MergeRounds × [[BatchCap]] merges, the ~V/B
  * trip count a 32k-vocab run needs (vs 32k trips unbatched). The
  * learned table is memoized per (session, dir): merges/vocab/
  * tokenize/fertility share ONE training run, the train-once
  * discipline a real tokenizer pipeline has.
  *
  * Determinism: ties on pair frequency break lexicographically; the
  * batch is applied by splicing the LEFTMOST occurrence of ANY batch
  * pattern, iterated [[ReplacePasses]] times to the fixpoint (a
  * whole-string replace would strand same-symbol runs — " a a a a "
  * must greedy-merge to [aa, aa]); distinct batch patterns can never
  * match at the same position (they'd share their first symbol), so
  * "leftmost of any" is well-defined in both engines.
  */
object Bpe {
  /** Batched merge rounds: up to [[MergeRounds]] × [[BatchCap]]
    * merges learned. 16 × 64 = a 1024-merge capacity — a credible
    * subword vocabulary for the test corpora (r9 verdict task 6); a
    * 32k-vocab production run raises BatchCap, not the loop count. */
  val MergeRounds = 16

  /** Max merges applied per round (the dominant set, rank-capped). */
  val BatchCap = 64

  /** Candidate pool per round: dominance is decided within the
    * top-[[CandCap]] pairs by (freq desc, pair). Exact for every
    * member: anything outside the pool ranks after everything inside,
    * and dominance only consults higher-ranked pairs. Kept at
    * 4×[[BatchCap]] so the rank-cap, not pool exhaustion, bounds the
    * batch; the per-round driver collect stays CandCap rows and the
    * dominance check CandCap² ≈ 65k comparisons. */
  val CandCap = 256

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
      // fully-merged single-symbol words have no pairs; without the
      // guard sequence(1, 0) DESCENDS (the LangModel lesson) and
      // element_at walks off the array
      .filter(size(col("a")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(a) - 1), " +
          "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")).as("pair"))
      .groupBy("pair").agg(sum(col("n")).as("freq"))

  /** One round's candidate row. */
  private case class Cand(pair: String, freq: Long) {
    val Array(la, rb) = pair.split(" ", 2)
    val merged: String = pair.replace(" ", "")
  }

  /** q ranks strictly before c in the (freq desc, pair asc) order. */
  private def ranksBefore(q: Cand, c: Cand): Boolean =
    q.freq > c.freq || (q.freq == c.freq && q.pair < c.pair)

  /** The batching conflict predicate — MUST mirror the oracle's d<k>
    * NOT EXISTS condition exactly. */
  private def interacts(q: Cand, c: Cand): Boolean =
    q.la == c.la || q.la == c.rb || q.rb == c.la || q.rb == c.rb ||
      q.merged == c.la || q.merged == c.rb ||
      c.merged == q.la || c.merged == q.rb

  /** The learned merge table plus the final segmentation — shared
    * derivation for all four queries. Returns (merges in application
    * order, final vocab). */
  private def learn(docs: DataFrame): (Seq[(String, Long)], DataFrame) =
    learnWith(docs, MergeRounds, BatchCap, CandCap)

  /** [[learn]] with explicit capacity knobs — the production-scale
    * configuration path (a 32k-vocab run raises batchCap/candCap, not
    * the loop count: rounds cost a full corpus pass each, batch width
    * costs only driver-side dominance checks of candCap² pairs). The
    * BOARD queries stay on the [[MergeRounds]]×[[BatchCap]] constants
    * (the oracle CTE chain derives from the same values in lockstep);
    * this entry exists for [[ScaleRehearsal]]'s ≥4k-merge rehearsal
    * (VERDICT r10 task 6). */
  private[llm] def learnWith(docs: DataFrame, mergeRounds: Int,
                             batchCap: Int, candCap: Int)
      : (Seq[(String, Long)], DataFrame) = {
    var vocab = wordVocab(docs).withColumn("syms", initSyms)
      .matEagerly // bounded (distinct words); pins the loop input
    // the ReplacePasses fixpoint bound assumes ≤ 2·passes symbols per
    // word (char count + eow marker): batch patterns are mutually
    // non-interacting, so each splice consumes 2 pre-round symbols —
    // ≤ S/2 splices per word per round. A longer word would MISS
    // merges silently and desync from the oracle — fail loudly instead
    val tooLong = vocab
      .filter(length(col("word")) + 1 > 2 * ReplacePasses).count()
    require(tooLong == 0,
      s"$tooLong corpus words exceed ${2 * ReplacePasses - 1} chars — " +
        s"raise ReplacePasses in BOTH engines (Bpe.scala + oracle)")
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    (1 to mergeRounds).foreach { _ =>
      val top = pairCounts(vocab)
        .orderBy(col("freq").desc, col("pair")).limit(candCap).collect()
        .map(r => Cand(r.getString(0), r.getLong(1))).toSeq
      // locally-dominant pairs, rank-capped — the oracle's d<k>/m<k>
      val batch = top
        .filter(c => !top.exists(q =>
          q.pair != c.pair && ranksBefore(q, c) && interacts(q, c)))
        .take(batchCap)
      if (batch.nonEmpty) {
        val pats = batch.map(m => (s" ${m.pair} ", s" ${m.merged} "))
        // per pass: splice the leftmost occurrence of ANY batch
        // pattern (match positions are distinct — equal positions
        // would mean a shared first symbol, excluded by dominance).
        // One withColumn per pass keeps the string an ATTRIBUTE
        // reference between passes (plan depth ReplacePasses), not a
        // nested expression tree.
        def anyLeftmostOnce(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
          val cands = array(pats.map { case (pat, rep) =>
            struct(call_function("instr", c, lit(pat)).as("pos"),
              lit(pat).as("pat"), lit(rep).as("rep"))
          }: _*)
          val hit = array_min(filter(cands, s => s.getField("pos") > 0))
          when(hit.isNull, c).otherwise(concat(
            call_function("substring", c, lit(1), hit.getField("pos") - 1),
            hit.getField("rep"),
            call_function("substring", c,
              hit.getField("pos") + length(hit.getField("pat")),
              lit(Int.MaxValue))))
        }
        vocab = (1 to ReplacePasses)
          .foldLeft(vocab)((df, _) =>
            df.withColumn("syms", anyLeftmostOnce(col("syms"))))
          .matEagerly
        all ++= batch.map(m => (m.pair, m.freq))
      } // empty batch: pairs exhausted — identity round, same as the
        // oracle's empty m<k> (the CTE chain is static either way)
    }
    (all.toSeq, vocab)
  }

  /** Train-once memo: the four BPE queries share one learned table
    * per (session, testdata dir) — localCheckpoint pins the final
    * segmentation, so reuse is safe within the session.
    *
    * CONTRACT (review r9): this assumes the testdata under `dir` is
    * immutable for the JVM's lifetime — the driver's contract (fresh
    * JVM per run; TempDirs fixtures share the same assumption).
    * Regenerating testdata inside one long-lived session would serve
    * stale BPE tables; such a service would key the memo on a data
    * fingerprint and evict. Size is bounded by the handful of sf
    * dirs, so the pinned checkpoint blocks are small and few. */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Seq[(String, Long)], DataFrame)]

  private def learnCached(spark: SparkSession, dir: String) =
    memo.getOrElseUpdate((spark, dir), learn(Tables.documents(spark, dir)))

  /** The merge table: (rank, pair, freq) — which pairs BPE learned, in
    * application order (round-major, within a round by (freq desc,
    * pair)), with their corpus-weighted frequencies. */
  def merges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (m, _) = learnCached(spark, dir)
    m.zipWithIndex
      .map { case ((pair, freq), i) => (i + 1, pair, freq) }
      .toDF("rank", "pair", "freq")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("freq"))
  }

  /** The symbol vocabulary after [[MergeRounds]] merges: every symbol
    * with its corpus-weighted frequency — the artifact a tokenizer
    * loads. Any wrong merge anywhere changes this table, so its hash
    * check adjudicates the whole loop. */
  def vocab(spark: SparkSession, dir: String): DataFrame = {
    val (_, seg) = learnCached(spark, dir)
    seg.withColumn("a", split(trim(col("syms")), " "))
      .select(col("n"), explode(col("a")).as("symbol"))
      .groupBy("symbol").agg(sum(col("n")).as("freq"))
  }

  /** Apply the learned merges back to the corpus: per document, the
    * word count and the BPE token count under the induced vocabulary —
    * the number a packing/pricing pass would bill. The segmented word
    * table IS the final loop state; it is keyed by distinct corpus
    * WORDS, which grow with an open-domain corpus, so the join is
    * UNHINTED (PLANS.md rule #2) — AQE broadcasts it while it fits
    * and shuffles past that instead of OOMing the driver. The
    * corpus-side work is one explode + join + per-doc aggregate. */
  def tokenize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, seg) = learnCached(spark, dir)
    val segmented = seg.select(col("word"),
      size(split(trim(col("syms")), " ")).cast("long").as("n_syms"))
    val perDoc = docs
      .select(col("doc_id"), explode(graft.func.Tokenizer.tokens(col("text"))).as("word"))
      .join(segmented, Seq("word")) // unhinted: word-keyed, corpus-derived
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        col("n_bpe_tokens"))
  }

  // ---- oracle ------------------------------------------------------

  /** One merge round as SQL: seg<k> -> p<k> (pair counts) -> c<k>
    * (top-[[CandCap]] candidates with split symbols) -> d<k>
    * (locally-dominant: NOT EXISTS a higher-ranked interacting pair —
    * the engine-equal twin of the Scala `interacts`/`ranksBefore`
    * driver check) -> m<k> (rank-capped batch), then one CTE per
    * any-pattern leftmost-splice pass (LATERAL picks the pattern with
    * the minimal strpos — positions are distinct, see the object
    * doc), seg<k> = the last pass. The SQL derives the batches
    * itself — nothing is spliced from the Spark run. One MATERIALIZED
    * CTE per pass keeps the text linear where nested CASEs would
    * compound. */
  private def roundSql(k: Int): String = {
    val prev = s"seg${k - 1}"
    val passes = (1 to ReplacePasses).map { p =>
      val src = if (p == 1) prev else s"s${k}_p${p - 1}"
      s"""s${k}_p$p AS MATERIALIZED (
         |  SELECT s.word, s.n,
         |    CASE WHEN b.pos IS NULL THEN s.syms
         |         ELSE substr(s.syms, 1, b.pos - 1) || b.rep ||
         |              substr(s.syms, b.pos + len(b.pat)) END AS syms
         |  FROM $src s LEFT JOIN LATERAL (
         |    SELECT ' ' || pair || ' ' AS pat, ' ' || merged || ' ' AS rep,
         |           strpos(s.syms, ' ' || pair || ' ') AS pos
         |    FROM m$k WHERE strpos(s.syms, ' ' || pair || ' ') > 0
         |    ORDER BY pos LIMIT 1) b ON true)""".stripMargin
    }.mkString(",\n")
    s"""p$k AS MATERIALIZED (SELECT pair, CAST(sum(n) AS BIGINT) AS freq FROM (
       |  SELECT n, unnest(list_transform(range(1, len(a)),
       |                   i -> a[i] || ' ' || a[i + 1])) AS pair
       |  FROM (SELECT n, string_split(trim(syms), ' ') AS a FROM $prev)
       |) GROUP BY pair),
       |c$k AS MATERIALIZED (
       |  SELECT pair, freq, string_split(pair, ' ')[1] AS la,
       |         string_split(pair, ' ')[2] AS rb,
       |         replace(pair, ' ', '') AS merged
       |  FROM (SELECT pair, freq FROM p$k ORDER BY freq DESC, pair LIMIT $CandCap)),
       |d$k AS MATERIALIZED (
       |  SELECT c.pair, c.freq, c.merged FROM c$k c WHERE NOT EXISTS (
       |    SELECT 1 FROM c$k q WHERE q.pair <> c.pair
       |      AND (q.freq > c.freq OR (q.freq = c.freq AND q.pair < c.pair))
       |      AND (q.la IN (c.la, c.rb) OR q.rb IN (c.la, c.rb)
       |           OR q.merged IN (c.la, c.rb) OR c.merged IN (q.la, q.rb)))),
       |m$k AS MATERIALIZED (
       |  SELECT pair, merged, freq,
       |         CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rk
       |  FROM d$k ORDER BY freq DESC, pair LIMIT $BatchCap),
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
      s"""SELECT CAST(row_number() OVER (ORDER BY round, rk) AS INTEGER)
         |         AS rank, pair, freq
         |FROM (""".stripMargin +
      (1 to MergeRounds)
        .map(k => s"SELECT $k AS round, rk, pair, freq FROM m$k")
        .mkString("\nUNION ALL\n") + ")"

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
    * Scale shape: the segmented-word table is keyed by distinct
    * corpus words — corpus-derived, so its join is UNHINTED
    * (PLANS.md rule #2; AQE decides); the corpus side is one explode
    * + join; the 1e6 scaling stays exact under Long to 10¹² BPE
    * tokens per language. */
  def fertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, seg) = learnCached(spark, dir)
    val segmented = seg.select(col("word"),
      size(split(trim(col("syms")), " ")).cast("long").as("n_syms"))
    docs
      .select(col("lang"),
        explode(graft.func.Tokenizer.tokens(col("text"))).as("word"))
      .join(segmented, Seq("word")) // unhinted: word-keyed, corpus-derived
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
