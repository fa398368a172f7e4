package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedLakeSpec extends SparkSpec {
  import spark.implicits._

  // one walker for every layout assertion across ALL suites — skip
  // rules must not diverge (hoisted r17)
  private def dataFiles(d: java.io.File) = graft.PlanWalk.dataFiles(d)

  private def viaParquetTable = graft.Tables.events(spark, Sf)
    .filter(to_date(col("ts")) === to_date(lit(PartitionedLake.PruneDay)) &&
      col("user_id").isNotNull && col("user_id") <= PartitionedLake.UserCap)
    .groupBy("event_type")
    .agg(count(lit(1)).as("n"), sum("user_id").as("s"),
      max("event_id").as("m"))
    .collect()
    .map(r => Option(r.getString(0)) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("compacted lake: one file per day directory, identical answers") {
    val root = new java.io.File(
      PartitionedLake.compactedLakeDir(spark, Sf, "parquet"))
    val dayDirs = Option(root.listFiles).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("dt="))
    assert(dayDirs.nonEmpty, "compacted lake wrote no day directories")
    val spray = dayDirs.map(d => d.getName -> dataFiles(d).size)
      .filter(_._2 != 1)
    assert(spray.isEmpty,
      s"compaction must leave exactly one file per day: $spray")
    // and an unmanaged multi-task write really does spray — the sf
    // fixture reads as ONE input partition (its unmanaged lake is
    // accidentally compact), so demonstrate with an 8-task writer
    val sprayRoot = graft.func.TempDirs.scoped("lake-spray")
    graft.Tables.events(spark, Sf)
      .withColumn("dt", to_date(col("ts")))
      .repartition(8)
      .write.mode("overwrite").partitionBy("dt").parquet(sprayRoot)
    val sprayTotal = dataFiles(new java.io.File(sprayRoot)).size
    assert(sprayTotal > dayDirs.size,
      s"expected the 8-task unmanaged write to spray >${dayDirs.size} " +
        s"files, got $sprayTotal — the small-files problem should exist")
    // write shape never changes answers
    val viaCompact = spark.read
      .schema(graft.Tables.events(spark, Sf)
        .withColumn("dt", to_date(col("ts"))).schema)
      .parquet(root.toString)
      .filter(col("dt") === to_date(lit(PartitionedLake.PruneDay)) &&
        col("user_id").isNotNull &&
        col("user_id") <= PartitionedLake.UserCap)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("s"),
        max("event_id").as("m"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaCompact === viaParquetTable)
  }

  test("DPP: the busy-day join derives the partition filter at runtime") {
    // expected busy days computed independently (exact integer
    // cross-multiplication, same contract as the dim)
    val dayCounts = graft.Tables.events(spark, Sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0) -> r.getLong(1))
    val (tot, k) = (dayCounts.map(_._2).sum, dayCounts.length.toLong)
    val busy = dayCounts.filter { case (_, n) => n * k > tot }.map(_._1)
    assert(busy.nonEmpty && busy.length < dayCounts.length,
      s"fixture degenerate: ${busy.length} of ${dayCounts.length} days busy")
    for (format <- Seq("parquet", "orc")) {
      // value check FIRST — dppQuery re-renders the lake on every
      // call (lakeDir overwrites), so the metric-bearing instance
      // must be the LAST render before the on-disk comparison (the
      // r16 re-render-decoupling lesson), and executed EXACTLY once
      // (a second run on the same QueryExecution would double the
      // numFiles accumulator)
      val got = PartitionedLake.dppQuery(spark, Sf, format).collect()
        .map(r => Option(r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val q = PartitionedLake.dppQuery(spark, Sf, format)
      q.queryExecution.toRdd.count()
      val plan = q.queryExecution.executedPlan
      val planStr = plan.toString
      // the partition filter must be the RUNTIME one — a dynamic
      // pruning expression on dt, not a static literal list
      val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(planStr).getOrElse("")
      assert(pf.contains("dynamicpruning"),
        s"$format fact scan must carry a dynamicpruning partition filter:\n$planStr")
      val want = graft.Tables.events(spark, Sf)
        .filter(to_date(col("ts")).isin(busy: _*))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("user_id").as("s"),
          max("event_id").as("m"))
        .collect()
        .map(r => Option(r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got === want)
      // ground truth from the executed scan's own metric: the fact
      // read exactly the busy days' files, strictly fewer than the lake
      val factScans = graft.PlanWalk.allScans(plan)
        .filter(_.toString.contains("dynamicpruning"))
      assert(factScans.size === 1,
        s"expected exactly one dynamically-pruned scan:\n$planStr")
      val filesRead = factScans.head.metrics("numFiles").value
      val root = new java.io.File(PartitionedLake.lakeRoot(Sf, format))
      val busyFiles = busy.map(d =>
        dataFiles(new java.io.File(root, s"dt=$d")).size).sum
      val lakeFiles = dataFiles(root).size
      assert(filesRead === busyFiles.toLong,
        s"$format scan read $filesRead files; busy days hold $busyFiles")
      assert(busyFiles < lakeFiles,
        s"fixture degenerate: every lake file is on a busy day")
    }
  }

  test("star query: DPP + runtime bloom + pushed predicate compose on " +
      "ONE executed fact scan") {
    // value check via the board surface (conf save/restore inside)
    val got = PartitionedLake.starQuery(spark, Sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty, "star query returned no groups")
    // plan assertions on the executed frame under the SAME confs the
    // board query uses — the metric-bearing instance must be the LAST
    // lake render (starFrame re-renders via lakeDir) and executed
    // exactly once (the dppQuery metric discipline)
    graft.func.Confs.withSqlConfs(spark)(PartitionedLake.starConfs: _*) {
      val q = PartitionedLake.starFrame(spark, Sf, "parquet")
      q.queryExecution.toRdd.count()
      val plan = q.queryExecution.executedPlan
      val planStr = plan.toString
      // exactly one fact scan, found by its dynamic partition filter
      val factScans = graft.PlanWalk.allScans(plan)
        .filter(_.toString.contains("dynamicpruning"))
      assert(factScans.size === 1,
        s"expected exactly one dynamically-pruned fact scan:\n$planStr")
      val scanStr = factScans.head.toString
      // device 1: runtime partition pruning (directory level)
      val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(scanStr)
        .getOrElse("")
      assert(pf.contains("dynamicpruning"),
        s"fact scan must carry the dynamic partition filter:\n$scanStr")
      // device 2: the bloom semi-filter on the NON-partition dim key.
      // A subquery-bearing predicate cannot enter the scan's pushed
      // DataFilters — it plans as the FilterExec DIRECTLY ABOVE the
      // fact scan (same codegen stage, before the user_id Exchange),
      // so locate the might_contain Filter whose SUBTREE is this scan
      val bloomOverFact = graft.PlanWalk.allNodes(plan).exists {
        case f: org.apache.spark.sql.execution.FilterExec =>
          val c = f.condition.toString
          c.contains("might_contain") && c.contains("xxhash64(user_id") &&
            graft.PlanWalk.allScans(f)
              .exists(_.toString.contains("dynamicpruning"))
        case _ => false
      }
      assert(bloomOverFact,
        s"the user_id bloom must semi-filter the fact scan before its " +
          s"shuffle:\n$planStr")
      // device 3: the data predicate pushed to the file format...
      assert(scanStr.contains("PushedFilters") &&
        scanStr.contains("Not(EqualTo(event_type,error))"),
        s"event_type predicate must push to the scan:\n$scanStr")
      // ...and unreferenced columns pruned from the read
      val rs = "ReadSchema: [^\\n]*".r.findFirstIn(scanStr).getOrElse("")
      assert(!rs.contains("props") && !rs.contains("value"),
        s"unread columns must prune from ReadSchema: $rs")
      // directory-level economy on the executed scan's own metric
      val filesRead = factScans.head.metrics("numFiles").value
      val root = new java.io.File(PartitionedLake.lakeRoot(Sf, "parquet"))
      val lakeFiles = dataFiles(root).size
      assert(filesRead < lakeFiles,
        s"DPP read $filesRead of $lakeFiles lake files — no pruning")
      // and the composed answer matches the board surface
      val fromFrame = PartitionedLake.starFrame(spark, Sf, "parquet")
        .collect().map(r => Option(r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(fromFrame === got)
    }
  }

  test("star query is a LAZY frame on a conf-scoped session — the " +
      "bloom fires at the CALLER's action") {
    val df = PartitionedLake.starQuery(spark, Sf)
    // lazy: the returned plan is the composed star itself, not the
    // r18 localized-aggregate device
    val lp = df.queryExecution.logical.toString
    assert(!lp.contains("LocalRelation"),
      s"star query must return the lazy composed plan:\n$lp")
    // the frame's OWN session carries the plan-shaping confs; the
    // parent session is untouched
    val key = "spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold"
    assert(df.sparkSession.conf.get(key) === "0")
    assert(spark.conf.getOption(key).forall(_ !== "0"),
      "scoped star confs leaked into the parent session")
    // and the shaping HOLDS at this (the caller's) action, outside
    // any conf scope: the executed plan carries the bloom semi-filter
    df.queryExecution.toRdd.count()
    val bloom = graft.PlanWalk.allNodes(df.queryExecution.executedPlan)
      .exists {
        case f: org.apache.spark.sql.execution.FilterExec =>
          f.condition.toString.contains("might_contain")
        case _ => false
      }
    assert(bloom,
      "the runtime bloom must fire when the caller executes the frame")
  }

  for (format <- Seq("parquet", "orc")) {
    test(s"$format lake: one-day query equals the parquet-table slice") {
      val got = PartitionedLake.pruneQuery(spark, Sf, format).collect()
        .map(r => Option(r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got === viaParquetTable)
      assert(got.nonEmpty, "vacuous fixture — no events on the prune day")
    }

    test(s"$format lake: scan opens ONLY the pruned day's directory") {
      val q = PartitionedLake.pruneQuery(spark, Sf, format)
      q.queryExecution.toRdd.count()
      val plan = q.queryExecution.executedPlan
      val planStr = plan.toString
      // the dt equality must be a PARTITION filter (directory-level
      // elimination), not a data filter evaluated per row
      val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(planStr).getOrElse("")
      assert(pf.contains("dt"), s"dt must be a partition filter:\n$planStr")
      // the data predicate still pushes into the surviving files
      assert(planStr.contains("PushedFilters: [") &&
        planStr.contains("LessThanOrEqual(user_id,"),
        s"user_id cap must push into the $format scan:\n$planStr")
      // unreferenced columns still prune ([<,]ts: at any position)
      val readSchema = "ReadSchema: \\S+".r.findFirstIn(planStr).getOrElse("")
      assert(readSchema.nonEmpty && !"[<,]props:".r.unanchored.matches(readSchema),
        s"unreferenced columns must prune from ReadSchema: $readSchema")
      // ground truth from the scan's OWN metric: files read == files
      // on disk under dt=PruneDay, strictly fewer than the lake total
      val scans = graft.PlanWalk.allScans(plan)
      assert(scans.size === 1, s"expected one file scan:\n$planStr")
      val filesRead = scans.head.metrics("numFiles").value
      // lakeRoot, not lakeDir: the executed scan's metric must be
      // compared against the layout it READ — re-rendering the lake
      // here would compare against a second, independent write
      val root = new java.io.File(PartitionedLake.lakeRoot(Sf, format))
      val dayFiles = dataFiles(
        new java.io.File(root, s"dt=${PartitionedLake.PruneDay}")).size
      val lakeFiles = dataFiles(root).size
      assert(filesRead === dayFiles,
        s"scan read $filesRead files, the day's directory holds $dayFiles")
      assert(dayFiles < lakeFiles,
        s"fixture degenerate: the whole lake is one day ($lakeFiles files)")
    }
  }
}
