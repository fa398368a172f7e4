package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IndexSpec extends SparkSpec {
  import spark.implicits._

  test("invertedIndex: df counts docs (not occurrences), head is bounded and ascending") {
    val docs = Seq(
      (10L, "alpha beta beta gamma"),
      (2L, "alpha alpha delta"),
      (7L, "alpha gamma"),
      (1L, "")).toDF("doc_id", "text")
    val out = Index.invertedIndexOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // repetition inside a doc must not inflate df
    assert(out("alpha") === ((3L, "2,7,10")))
    assert(out("beta") === ((1L, "10")))
    assert(out("gamma") === ((2L, "7,10")))
    assert(out("delta") === ((1L, "2")))
    assert(!out.contains(""), "empty tokens filtered")
  }

  test("invertedIndex: posting head truncates at PostingHead lowest doc_ids") {
    val docs = (1L to 20L).map(i => (i, "tok")).toDF("doc_id", "text")
    val Array(row) = Index.invertedIndexOf(docs).collect()
    assert(row.getLong(1) === 20L, "df counts all docs")
    assert(row.getString(2) ===
      (1L to Index.PostingHead.toLong).mkString(","),
      "head keeps the lowest ids only")
  }

  test("invertedIndex at Sf: df sums to total distinct-token mass") {
    val docs = graft.Tables.documents(spark, Sf)
    val out = Index.invertedIndexOf(docs)
    val dfSum = out.agg(sum("df")).as[Long].head()
    val pairCt = docs.select(col("doc_id"),
        explode(array_distinct(graft.func.Tokenizer.tokens(col("text")))))
      .count()
    assert(dfSum === pairCt)
  }

  test("plans: inverted index runs on one token exchange; idf df-table broadcasts") {
    val invPlan = Index.invertedIndex(spark, Sf)
      .queryExecution.executedPlan.toString
    val tokenExchanges = "Exchange hashpartitioning\\(token".r
      .findAllIn(invPlan).size
    assert(tokenExchanges === 1,
      s"df window, head window, and final groupBy must share ONE token partitioning:\n$invPlan")
    // execute FIRST, then read the AQE FINAL plan: the pre-execution
    // plan's join pick rides Catalyst's static size estimate of an
    // explode+aggregate subtree, which an estimator or fixture change
    // could flip spuriously — the claim under test is that RUNTIME
    // AQE broadcasts the df table at this measured size (review r11)
    val idf = Index.idfRarity(spark, Sf)
    idf.queryExecution.toRdd.count()
    val idfPlan = idf.queryExecution.executedPlan.toString
    assert(idfPlan.contains("BroadcastHashJoin"),
      s"AQE should pick broadcast for the df table at this scale " +
        s"(no mandatory hint — VocabHintSpec):\n$idfPlan")
  }

  test("idfRarity: exact-rational IDF, occurrence-weighted, null-safe on empty docs") {
    val docs = Seq(
      (1L, "common common rare"), // common df=2, rare df=1
      (2L, "common"),
      (3L, "")).toDF("doc_id", "text")
    val out = Index.idfRarityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 2*(1e6 DIV 2) + 1*(1e6 DIV 1) = 2000000; DIV 3 tokens
    assert(out(1L).getLong(1) === 3L)
    assert(out(1L).getLong(2) === 2000000L)
    assert(out(1L).getLong(3) === 666666L)
    // doc 2: pure common vocabulary scores lower than doc 1
    assert(out(2L).getLong(3) === 500000L)
    assert(out(1L).getLong(3) > out(2L).getLong(3))
    // empty doc survives with zero tokens and NULL score
    assert(out(3L).getLong(1) === 0L)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("bm25: scores equal an exact BigInt driver recompute") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join window spark filter table"), // tf spark=2
      (2L, "spark alone here with much longer text " +
        "padding padding padding padding padding"),
      (3L, "join window join window join window"),
      (4L, "no query terms at all in this one"),
      (5L, "")).toDF("doc_id", "text")
    val corpus = docs.select(
      graft.func.Tokenizer.tokens(col("text")).as("t")).as[Seq[String]]
      .collect()
    val n = BigInt(corpus.length)
    val a = BigInt(corpus.map(_.length).sum)
    val dls = corpus.map(t => BigInt(t.length))
    val tfs = corpus.map(t =>
      Index.Bm25Terms.map(q => q -> BigInt(t.count(_ == q)))
        .filter(_._2 > 0).toMap)
    val dfm = Index.Bm25Terms.map(q =>
      q -> BigInt(tfs.count(_.contains(q)))).toMap
    val exp = tfs.zipWithIndex.filter(_._1.nonEmpty).map { case (tf, i) =>
      val dl = dls(i)
      val score = tf.map { case (q, f) =>
        (BigInt(1000000) * n / dfm(q)) * 22 * f * a /
          (BigInt(10) * f * a + BigInt(3) * a + BigInt(9) * dl * n)
      }.sum
      (i + 1L, dl.toLong, score.toLong)
    }.sortBy { case (id, _, s) => (-s, id) }
      .zipWithIndex.map { case ((id, dl, s), r) => (r + 1L, id, dl, s) }
    val got = Index.bm25Of(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === exp)
    assert(!got.exists(_._2 === 4L), "doc without query terms absent")
    // tf saturation: doc 1 (3 distinct terms, 4 hits) outranks doc 3
    // (2 distinct terms, 6 hits) — breadth beats repeated terms
    assert(got.head._2 === 1L)
    assert(got.map(_._2).contains(3L))
  }

  test("bm25 at Sf: broadcast term stats, take-ordered top-k (plan shape)") {
    val plan = Index.bm25(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must not be a full sort exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the |terms|-row df table must broadcast:\n$plan")
    val rows = Index.bm25(spark, Sf).count()
    assert(rows === Index.Bm25TopK.toLong, "corpus has plenty of matches")
  }

  test("phraseSearch: anchor adjacency finds exact consecutive matches") {
    // Phrase = ("table", "scan")
    val docs = Seq(
      (1L, "a table scan b"),            // one hit at pos 1
      (2L, "table scan table scan"),     // two hits (0 and 2)
      (3L, "table b scan"),              // terms present, not adjacent
      (4L, "scan table"),                // reversed — no hit
      (5L, "table table scan"))          // hit at pos 1 only
      .toDF("doc_id", "text")
    val out = Index.phraseSearchOf(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(1L -> ((1L, 1L)), 2L -> ((2L, 0L)), 5L -> ((1L, 1L))))
  }

  test("phraseSearch plan: term filter precedes the shuffle; one agg chain") {
    val df = Index.phraseSearch(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the k-row phrase table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"adjacency must be the anchor aggregate, not a position join:\n$plan")
    assert(df.count() > 0, "word-salad corpus contains the phrase")
  }
}
