package graft

import org.apache.spark.sql.functions._

/** Degenerate-input sweep (VERDICT r10 task 4): every public operator
  * on the board — the whole of [[SparkEntry.queries]], via the same
  * sf-dir indirection the driver uses — must be SCHEMA-STABLE and
  * NON-THROWING on inputs a 100 TB run sees routinely:
  *
  *  - `empty`: every table present with its real schema and 0 rows
  *    (an empty partition / an empty day);
  *  - `single`: 1 row per table (a degenerate group everywhere —
  *    window frames of one, self-joins with no second row);
  *  - `nulltext`: `documents` holding only a NULL-text and an
  *    empty-text row (ingest feeds both constantly), other tables
  *    single-row;
  *  - `badvec`: `embeddings` holding one well-formed vector plus a
  *    NULL, a truncated (7-dim), and an empty-array vector — the
  *    corrupt-ingest classes the similarity family's malformed-row
  *    guard must drop rather than NPE on. Other tables single-row;
  *  - `nullevents`: `events` holding one intact row plus rows with a
  *    NULL event_type / NULL props / malformed-JSON props / NULL ts /
  *    NULL user_id — what a lossy behavior-log ingest actually
  *    delivers. Other tables single-row;
  *  - `nullorders`: `orders`/`lineitem` holding one intact row each
  *    plus rows with NULL dates / amounts / keys — CDC envelopes
  *    deliver partial records on schema drift, and the interval-join,
  *    money-arithmetic, and graph families must drop or
  *    null-propagate them, never abort. Other tables single-row;
  *  - `dupkeys`: every table holds the SAME row twice — the
  *    at-least-once redelivery every CDC/Kafka ingest produces.
  *    Operators may emit duplicates or dedup them, but none may
  *    abort on a violated primary-key assumption.
  *
  * Individual null-class fixes existed before (r9's word-break NULL
  * fix), but nothing swept the whole surface. Each variant runs all
  * queries, forces FULL evaluation (`toRdd.count()` — a bare count()
  * would let Catalyst prune the expression work where the throw
  * lives), checks the schema equals the real-data schema, and
  * reports every failure at once — one assertion per variant, so a
  * regression names all its casualties in a single run. */
class DegenerateSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** variant name -> scratch sf-dir with that variant's tables. */
  private lazy val scratch: Map[String, String] = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-degenerate").toString
    Seq("empty", "single", "nulltext", "badvec", "nullevents",
      "nullorders", "dupkeys", "unicode").map { v =>
      val dir = s"$base/$v"
      tables.foreach { t =>
        // events: write through the normalized reader — the raw file
        // may be TIMESTAMP(NANOS), which plain spark.read refuses;
        // the round-trip lands on the MICROS encoding Tables.events
        // equally accepts
        val src =
          if (t == "events") Tables.events(spark, Sf)
          else spark.read.parquet(s"$Sf/$t.parquet")
        val out = (v, t) match {
          case ("empty", _) => src.limit(0)
          case ("nulltext", "documents") =>
            val one = src.limit(1)
            one.withColumn("text", lit(null).cast("string"))
              .unionByName(one
                .withColumn("doc_id", col("doc_id") + 1000000L)
                .withColumn("text", lit("")))
          case ("nullevents", "events") =>
            val one = src.limit(1)
            def corrupt(off: Long, c: String,
                        v: org.apache.spark.sql.Column) =
              one.withColumn("event_id", col("event_id") + off)
                .withColumn(c, v)
            one
              .unionByName(corrupt(1000000L, "event_type",
                lit(null).cast("string")))
              .unionByName(corrupt(2000000L, "props",
                lit(null).cast("string")))
              .unionByName(corrupt(3000000L, "props", lit("{oops")))
              // digit run past BIGINT range: regexp_extract matches,
              // and only try_cast (not a bare ANSI cast) survives the
              // overflow — guards the LogSplit.parsed r12 fix
              .unionByName(corrupt(6000000L, "props",
                lit("""{"k": 99999999999999999999}""")))
              .unionByName(corrupt(4000000L, "ts",
                lit(null).cast("timestamp")))
              .unionByName(corrupt(5000000L, "user_id",
                lit(null).cast("long")))
          case ("dupkeys", _) =>
            val one = if (t == "embeddings") lowestVec(src) else src.limit(1)
            one.unionByName(one)
          case ("nullorders", "orders" | "lineitem") =>
            val one = src.limit(1)
            val key = if (t == "orders") "o_orderkey" else "l_orderkey"
            val nulled = t match {
              case "orders" => Seq("o_orderdate", "o_totalprice", "o_custkey")
              case _ => Seq("l_shipdate", "l_quantity", "l_partkey",
                "l_extendedprice")
            }
            nulled.zipWithIndex.foldLeft(one) { case (acc, (c, i)) =>
              acc.unionByName(one
                .withColumn(key, col(key) + (i + 1) * 1000000L)
                .withColumn(c, lit(null).cast(one.schema(c).dataType)))
            }
          case ("unicode", "documents") =>
            // the text-family hazard class: surrogate pairs (emoji),
            // combining vs precomposed accents, CJK (the reference's
            // IK tokenizer exists FOR this case), RTL scripts, ZWJ
            // sequences, and case-folding traps — the inputs where
            // UTF-16 code-unit engines and codepoint engines can
            // legitimately drift (oracle parity separately verified
            // on a full unicode corpus, PLANS.md §r13)
            val one = src.limit(1)
            def udoc(off: Long, text: String) =
              one.withColumn("doc_id", col("doc_id") + off)
                .withColumn("text", lit(text))
                .withColumn("n_chars", length(lit(text)).cast("long"))
            one
              .unionByName(udoc(1000000L,
                "smile 😀 flag 🇫🇷 emoji"))
              .unionByName(udoc(2000000L, "café café combining"))
              .unionByName(udoc(3000000L,
                "中文分词 mixed ASCII 日本語"))
              // contains the 3-char lexicon word 关键词 — exercises
              // the dict segmenter's trigram FMM probe
              .unionByName(udoc(7000000L,
                "关键词统计与数据分析"))
              .unionByName(udoc(4000000L,
                "שלום rtl مرحبا text"))
              .unionByName(udoc(5000000L,
                "zwj 👨‍👩‍👧 family"))
              .unionByName(udoc(6000000L,
                "TÜRKİYE straße UPPER lower"))
          case ("badvec", "embeddings") =>
            // vec_id 0 keeps the ANN seed contract; the corrupt rows
            // get distinct far-away ids
            val one = lowestVec(src)
            def corrupt(off: Long, emb: org.apache.spark.sql.Column) =
              one.withColumn("vec_id", col("vec_id") + off)
                .withColumn("embedding", emb)
            one
              .unionByName(corrupt(1000000L, lit(null).cast("array<float>")))
              .unionByName(corrupt(2000000L, expr("slice(embedding, 1, 7)")))
              .unionByName(corrupt(3000000L,
                expr("array()").cast("array<float>")))
          case (_, "embeddings") => lowestVec(src)
          case _ => src.limit(1)
        }
        out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      v -> dir
    }.toMap
  }

  /** The single-row embeddings fixture must be the LOWEST vec_id —
    * the ANN seed contract (seeds are vec_id < K) distinguishes a
    * tiny table (degrade gracefully) from a renumbered one (hard
    * error); an unordered limit(1) would pick an arbitrary row and
    * trip the renumbered guard on a fixture-order change. */
  private def lowestVec(src: org.apache.spark.sql.DataFrame) =
    src.orderBy("vec_id").limit(1)

  /** Reference schemas from the real sf dir — analysis only, no
    * execution (schema stability is judged against what the driver's
    * verify run sees). */
  private lazy val refSchemas: Map[String, org.apache.spark.sql.types.StructType] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, Sf).schema
    }

  private def sweep(variant: String): Unit = {
    val dir = scratch(variant)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, dir)
          if (df.schema != refSchemas(name))
            Some(s"$name: schema drift\n  ref: ${refSchemas(name).simpleString}" +
              s"\n  got: ${df.schema.simpleString}")
          else {
            df.queryExecution.toRdd.count()
            None
          }
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} operators break on '$variant' input:\n" +
        failures.mkString("\n"))
  }

  test("all operators survive empty tables")(sweep("empty"))
  test("all operators survive single-row tables")(sweep("single"))
  test("all operators survive null/empty-text documents")(sweep("nulltext"))
  test("all operators survive null/truncated/empty vectors")(sweep("badvec"))
  test("all operators survive corrupt event rows")(sweep("nullevents"))

  test("BIGINT-overflow digit run in props parses to NULL, not an abort") {
    val dir = scratch("nullevents")
    val parsed = graft.dwd.LogSplit.parsed(spark, dir)
    // the overflow row carries the LARGEST corrupt-offset (+6M), so it
    // is the max event_id regardless of which fixture row limit(1)
    // picked — a >= threshold would silently include other corrupt
    // rows if the fixture's base ids ever grow (r11 self-review's
    // unordered-limit flake class)
    val maxId = parsed.agg(max(col("event_id"))).head().getLong(0)
    val overflowed = parsed.filter(col("event_id") === maxId)
      .select(col("prop_k")).collect()
    assert(overflowed.nonEmpty && overflowed.forall(_.isNullAt(0)),
      "try_cast must NULL the out-of-range extract")
  }
  test("all operators survive partial order/lineitem rows")(sweep("nullorders"))
  test("all operators survive redelivered duplicate rows")(sweep("dupkeys"))
  test("all operators survive surrogate/CJK/RTL/ZWJ text")(sweep("unicode"))
}
