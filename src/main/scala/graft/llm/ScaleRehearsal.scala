package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 scale rehearsal (VERDICT r9 "Next round" task 3) — a
  * standalone main, NOT part of the query board. Everything written
  * goes under [[Root]] in /tmp; /root/testdata is never touched.
  *
  * Two deterministic scratch corpora, 10×+ the sf0.1 document count:
  *
  * 1. CLOSURE corpus (100k docs): 900 near-duplicate clusters of 100
  *    docs (pairwise shingle-Jaccard 58/60 ≈ 0.967 — every pair
  *    passes the 0.8 verify) plus 40 sliding-window chains of 250
  *    docs (adjacent J = 74/82 ≈ 0.902, distance-2 J = 70/86 ≈
  *    0.814, distance-3 below threshold — so components are ±2-step
  *    paths with diameter ~125, forcing REAL pointer-doubling
  *    rounds). The banded pair graph is ~900·C(100,2) + chain pairs
  *    ≈ 4.47M undirected pairs > DriverClosureMaxEdges = 4M, so
  *    [[Dedup.closureKeepers]]'s dispatch (2×pairs > 8M doubled
  *    rows) takes the DISTRIBUTED loop on real LSH output — the
  *    path that previously ran only on DedupSpec's synthetic toy.
  *    Ground truth is known by construction (cluster/chain minimum
  *    doc_id), so the labels are verified exactly.
  *
  * 2. VOCAB corpus (50k docs × 200 tokens): a 30k-word Zipf core
  *    plus 20 unique tokens per doc (the URL/id class that makes
  *    open-domain vocabularies corpus-sized). Measures the actual
  *    row counts and byte sizes of the frames whose broadcast hints
  *    round 10 deleted (token df table, unigram/bigram counts, the
  *    BPE word table = the word-type frame), then runs idfRarity /
  *    bigramScore / pmi end-to-end UNHINTED and reports which join
  *    strategy AQE picked at this size.
  */
object ScaleRehearsal {
  val Root = "/tmp/graft-scale"

  // closure corpus
  val Clusters = 900
  val ClusterSize = 100
  val ClusterBaseTokens = 60
  val Chains = 40
  val ChainLen = 250
  val ChainTokens = 80
  val ChainStride = 4

  // vocab corpus
  val VocabDocs = 50000
  val CoreVocab = 30000
  val CoreTokensPerDoc = 180
  val UniqueTokensPerDoc = 20

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scale] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- corpus generation (idempotent: skip when COMPLETE —
    // _SUCCESS, not bare dir existence, or an interrupted write would
    // be silently reused as a partial corpus; review r10) ------------
    def complete(dir: String): Boolean =
      new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()
    val closureDir = s"$Root/closure"
    if (!complete(closureDir))
      time("generate closure corpus") {
        val clusters = spark.range(Clusters.toLong * ClusterSize).map { i =>
          val k = i / ClusterSize; val j = i % ClusterSize
          val base = (0 until ClusterBaseTokens)
            .map(t => s"k${k}b$t").mkString(" ")
          (k * 1000L + j, s"$base k${k}u$j")
        }
        val chains = spark.range(Chains.toLong * ChainLen).map { i =>
          val c = i / ChainLen; val j = i % ChainLen
          val start = ChainStride * j.toInt
          val toks = (start until start + ChainTokens).map(t => s"c${c}w$t")
          (10000000L + c * 1000L + j, toks.mkString(" "))
        }
        clusters.union(chains).toDF("doc_id", "text")
          .withColumn("lang", lit("en"))
          .withColumn("source", lit("scale"))
          .withColumn("n_chars", length(col("text")))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$closureDir/documents.parquet")
      }

    val vocabDir = s"$Root/vocab"
    if (!complete(vocabDir))
      time("generate vocab corpus") {
        spark.range(VocabDocs.toLong).map { i =>
          val rnd = new java.util.Random(i * 2654435761L + 12345L)
          val b = new StringBuilder
          var u = 0
          (0 until CoreTokensPerDoc).foreach { t =>
            // inverse-CDF Zipf-ish rank: log-uniform over [1, CoreVocab]
            val r = math.min(CoreVocab - 1,
              math.exp(rnd.nextDouble() * math.log(CoreVocab.toDouble)).toInt)
            b.append('w').append(r).append(' ')
            if (t % (CoreTokensPerDoc / UniqueTokensPerDoc) == 0
                && u < UniqueTokensPerDoc) { // intersperse the unique ids
              b.append('u').append(i).append('x').append(u).append(' ')
              u += 1
            }
          }
          (i, b.result().trim)
        }.toDF("doc_id", "text")
          .withColumn("lang", lit("en"))
          .withColumn("source", lit("scale"))
          .withColumn("n_chars", length(col("text")))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$vocabDir/documents.parquet")
      }

    // ---- (a) the >4M-edge closure on real LSH output ----------------
    println(s"[scale] === closure rehearsal ($closureDir) ===")
    val (pairs, nPairs) = time("lshDuplicates (shingle→minhash→band→verify)") {
      val p = Dedup.lshDuplicates(spark, closureDir)
        .select("doc_a", "doc_b").localCheckpoint()
      (p, p.count())
    }
    println(s"[scale] banded+verified pairs: $nPairs " +
      s"(bound ${Dedup.DriverClosureMaxEdges}; doubled rows " +
      s"${2 * nPairs} > ${2 * Dedup.DriverClosureMaxEdges} ⇒ " +
      s"closureKeepers dispatches to the DISTRIBUTED loop)")
    require(nPairs > Dedup.DriverClosureMaxEdges,
      "rehearsal corpus must exceed the driver-closure bound")
    val (labels, rounds) = time("closureKeepersCounted (pointer doubling)") {
      val (l, r) = Dedup.closureKeepersCounted(pairs)
      l.count(); (l, r)
    }
    println(s"[scale] pointer-doubling rounds: $rounds " +
      s"(cap ${Dedup.ClosureMaxRounds})")
    // EXACT adjudication: the distributed loop must equal the
    // connected components of the pair graph LSH ACTUALLY EMITTED —
    // Dedup.driverClosure (union-by-min + path compression) over the
    // same edges, the path closureKeepers takes BELOW the bound
    // (a rehearsal-scale 4.5M×16B collect).
    val exact = time("driver union-find adjudicator") {
      Dedup.driverClosure(Dedup.undirectedEdges(pairs))
        .withColumnRenamed("keeper", "exact_keeper")
        .localCheckpoint()
    }
    val nExact = exact.count()
    val wrong = labels.join(exact, Seq("doc_id"))
      .filter(col("keeper") =!= col("exact_keeper")).count()
    val labeled = labels.count()
    println(s"[scale] labels: $labeled docs; distributed loop vs " +
      s"driver union-find mismatches: $wrong")
    require(wrong == 0 && labeled == nExact,
      "distributed closure disagrees with the exact component labels")

    // separately: banding RECALL vs the constructed cluster/chain
    // truth — informational, NOT a closure property (LSH is
    // probabilistic by design; a missed band pair can split a chain)
    val intended = expr(
      """CASE WHEN doc_id >= 10000000
        |     THEN 10000000 + ((doc_id - 10000000) DIV 1000) * 1000
        |     ELSE (doc_id DIV 1000) * 1000 END""".stripMargin)
    val offTruth = labels.filter(col("keeper") =!= intended).count()
    println(f"[scale] banding recall: $offTruth of $labeled docs " +
      f"(${100.0 * offTruth / labeled}%.3f%%) differ from the " +
      "constructed-corpus components (missed band edges)")
    // recall guard must ALSO catch docs dropped from the pair graph
    // entirely (they are absent from `labels`, not mislabeled): by
    // construction every doc has ≥1 intra-cluster/adjacent edge, so
    // the label set itself must stay near-complete (review r10)
    val nDocs = Clusters.toLong * ClusterSize + Chains.toLong * ChainLen
    require(labeled >= nDocs - nDocs / 100,
      s"label set lost docs: $labeled of $nDocs — edges dropped " +
        "wholesale, investigate signature pipeline")
    require(offTruth < labeled / 100,
      "banding recall collapsed — investigate signature pipeline")

    // ---- (b) vocabulary-frame sizes at 10× sf0.1 --------------------
    println(s"[scale] === vocab-frame measurement ($vocabDir) ===")
    val docs = graft.Tables.documents(spark, vocabDir)
    val toks = docs.select(
      explode(graft.func.Tokenizer.tokens(col("text"))).as("w"))
    val Seq(nTok, nTypes, wBytes) = time("word-type frame") {
      val t = toks.groupBy("w").agg(count(lit(1)).as("c"))
      val r = t.agg(sum("c"), count(lit(1)),
        // UnsafeRow(string, long) ≈ 8B header + 16B field slots +
        // padded string bytes — the broadcast-side cost model
        sum(length(col("w")) + lit(28L))).head()
      Seq(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    println(s"[scale] tokens=$nTok wordTypes=$nTypes " +
      f"dfTableEst=${wBytes / 1e6}%.1f MB " +
      "(= df/unigram/BPE-word frame row count)")
    val Seq(nBg, bgBytes) = time("bigram-type frame") {
      val bg = docs
        .select(graft.func.Tokenizer.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c"))
      val r = bg.agg(count(lit(1)), sum(length(col("bg")) + lit(28L))).head()
      Seq(r.getLong(0), r.getLong(1))
    }
    println(f"[scale] bigramTypes=$nBg est=${bgBytes / 1e6}%.1f MB")

    // end-to-end unhinted runs: what did AQE actually pick?
    def joins(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join")).map(_.trim.take(100))
        .mkString(" | ")
    // vocabCoverage was REWRITTEN in r9 for exactly this regime (the
    // freq-keyed offsets device replacing a global-rank window over
    // the vocabulary) — validate the Zipf-collapse premise and the
    // device's exactness at 1M+ open-domain types
    time("vocabCoverage at 1M types (freq-keyed device)") {
      val cov = VocabCoverage.vocabCoverageOf(docs).localCheckpoint()
      val nFreqs = cov.select("freq").distinct().count()
      val r = cov.agg(count(lit(1)), max("rank"), max("cum_ppm")).head()
      println(s"[scale] coverage rows=${r.getLong(0)} " +
        s"distinctFreqs=$nFreqs (the O(√tokens) offsets frame) " +
        s"maxRank=${r.getLong(1)} finalCum=${r.getLong(2)} ppm")
      require(r.getLong(0) == r.getLong(1) && r.getLong(2) == 1000000L,
        "coverage must rank every word exactly once and close at 1e6")
    }

    // toRdd.count() (the BenchOne device) evaluates THIS df's full
    // plan — no column pruning (a bare Dataset.count() lets Catalyst
    // skip the scoring expressions) — and finalizes its AQE plan so
    // joins() reads what actually ran
    def full(d: org.apache.spark.sql.DataFrame): d.type = {
      d.queryExecution.toRdd.count(); d
    }
    val idf = time("idfRarity end-to-end (unhinted)")(
      full(Index.idfRarityOf(docs)))
    println(s"[scale] idfRarity joins: ${joins(idf)}")
    val lm = time("bigramScore end-to-end (unhinted)")(
      full(LangModel.bigramScoreOf(docs)))
    println(s"[scale] bigramScore joins: ${joins(lm)}")
    val pmi = time("pmi end-to-end (unhinted)")(full(Colloc.pmiOf(docs)))
    println(s"[scale] pmi joins: ${joins(pmi)}")

    spark.stop()
    println("[scale] DONE")
  }
}
