package graft.dwd

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DwdSpec extends SparkSpec {
  import spark.implicits._

  test("nested log parse: every record classified start XOR page") {
    val out = LogNested.startSplit(spark, Sf).cache()
    val bad = out.filter(
      (col("stream") === "start" && col("page_id").isNotNull) ||
      (col("stream") === "page" && col("page_id").isNull)).count()
    assert(bad == 0)
    assert(out.filter(col("stream") === "start").count() > 0)
    assert(out.filter(col("stream") === "page").count() > 0)
  }

  test("displays explode: row count = Σ event_id%3 over page events, " +
    "page_id injected from parent") {
    val ev = graft.Tables.events(spark, Sf)
      .filter(col("event_type") =!= "signup")
      .select((col("event_id") % 3).as("n"), col("event_type"))
    val expected = ev.agg(sum("n")).as[Long].head()
    val out = LogNested.displayExplode(spark, Sf).cache()
    assert(out.count() == expected)
    // injected page_id must equal the parent's event_type-derived page
    val mismatches = out.join(
        graft.Tables.events(spark, Sf).select(col("event_id"),
          col("event_type")),
        "event_id")
      .filter(col("page_id") =!= col("event_type")).count()
    assert(mismatches == 0)
  }

  test("CDC envelope: malformed counts match the poison pattern") {
    val o = graft.Tables.orders(spark, Sf)
    val expectedBad = o.filter(
      col("o_orderkey") % 101 === 0 || col("o_orderkey") % 97 === 0).count()
    val out = CdcEnvelope(spark, Sf).cache()
    val rejected = out.filter(col("sink_table") === "_malformed")
      .agg(sum("row_ct")).as[Long].head()
    assert(rejected == expectedBad)
    // bootstrap-insert normalized away: only insert/update survive
    val ops = out.filter(col("sink_table") === "order_info")
      .select("op_type").as[String].collect().toSet
    assert(ops == Set("insert", "update"))
  }

  test("db router: every configured sink gets its pruned column set") {
    val routed = DbRouter.routed(spark, Sf)
    assert(routed.keySet == DbRouter.config.map(_._3).toSet)
    DbRouter.config.foreach { case (_, _, sink, cols) =>
      assert(routed(sink).columns.toSeq == cols.split(",").toSeq)
    }
  }

  test("dim auto-create: creates once, appends, catalog schema pruned") {
    val out = DbRouter.dimAutoCreate(spark, Sf)
      .select("sink_table", "col_ct", "row_ct")
      .as[(String, Int, Long)].collect()
      .map { case (t, c, n) => t -> ((c, n)) }.toMap
    val dims = DbRouter.config.filter(_._2 == "hbase")
    assert(out.keySet == dims.map(_._3).toSet)
    // counts and schema match the routed source exactly
    dims.foreach { case (src, _, sinkTable, cols) =>
      val srcCt = graft.Tables.read(spark, Sf, src).count()
      assert(out(sinkTable) == ((cols.split(",").length, srcCt)))
      val catalogCols = spark.table(s"graft_$sinkTable").columns.toSeq
      assert(catalogCols == cols.split(",").toSeq, "routed schema, pruned")
    }
    // ensure is a no-op on an existing table even with a WIDER frame
    val widened = graft.Tables.read(spark, Sf, dims.head._1)
    assert(!DbRouter.ensureDimTable(spark, s"graft_${dims.head._3}", widened))
    assert(spark.table(s"graft_${dims.head._3}").columns.toSeq ==
      dims.head._4.split(",").toSeq)
  }

  test("dim upsert: updates replace, new keys insert, others persist") {
    val out = DbRouter.dimUpsert(spark, Sf)
      .select("c_custkey", "c_name", "ts")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val src = graft.Tables.read(spark, Sf, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect().toMap
    // one row per pk: originals + the shifted inserts
    val newKeys = src.keySet.filter(_ % 5 == 0).map(_ + 10000000L)
    assert(out.keySet === src.keySet ++ newKeys)
    src.foreach { case (k, name) =>
      if (k % 3 == 0) assert(out(k) === (("u:" + name, 2000L)), s"update $k")
      else assert(out(k) === ((name, 1000L)), s"untouched $k")
    }
    newKeys.foreach { k =>
      assert(out(k) === (("new:" + src(k - 10000000L), 2000L)), s"insert $k")
    }
    // TRUE replay idempotence: apply the same update batch AGAIN to
    // the existing table (no reset — dimUpsert itself resets, so
    // re-running it only proves determinism) and assert the durable
    // state is unchanged — the Phoenix-upsert/ReplacingMergeTree
    // contract under at-least-once delivery
    val table = "graft_dim_customer_upsert"
    val base = graft.Tables.read(spark, Sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"), col("c_nationkey"))
    val updates = base.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_name", concat(lit("u:"), col("c_name")))
      .unionByName(base.filter(col("c_custkey") % 5 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(lit("new:"), col("c_name")).as("c_name"),
          col("c_nationkey")))
      .withColumn("ts", lit(2000L))
    DbRouter.upsertDimTable(spark, table, updates, Seq("c_custkey"), "ts")
    val replayed = spark.table(table)
      .select("c_custkey", "c_name", "ts")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(replayed === out, "replaying the batch must not change state")

    // the Redis-delete analog (reference DimSink invalidates the
    // cached dim row on update so no reader serves stale data,
    // app/func/DimSink.java): a CACHED catalog table must reflect the
    // upsert, not the pre-update snapshot — Spark uncaches the table
    // on overwrite, and this pins that contract
    spark.table(table).cache().count()
    try {
      assert(spark.table(table).filter(col("c_name").startsWith("u2:"))
        .count() === 0L)
      val bump = base.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_name", concat(lit("u2:"), col("c_name")))
        .withColumn("ts", lit(3000L))
      val expectedBumped = bump.count()
      DbRouter.upsertDimTable(spark, table, bump, Seq("c_custkey"), "ts")
      assert(spark.table(table).filter(col("c_name").startsWith("u2:"))
        .count() === expectedBumped, "cached readers must see the update")
    } finally {
      // scoped cleanup (not clearCache: the session is shared across
      // parallel suites); on the success path the overwrite already
      // invalidated this entry, on failure this drops the stale one
      spark.table(table).unpersist(): Unit
    }
  }
}
