package graft

import org.apache.spark.graftshim.ListenerShim

/** The round-11 bench instrument: [[Bench.TaskTimeListener]] diffed
  * around a blocking action (bus drained on both sides) must
  * attribute that action's task time to the interval. The official
  * artifact's task_s/cpu_s columns ride on exactly this arithmetic,
  * so pin it: a real job moves both counters, a no-op interval moves
  * neither, and CPU time stays within a sane band of run time. */
class TaskTimeSpec extends SparkSpec {

  test("a job's task time lands between the surrounding snapshots") {
    val l = new Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(l)
    try {
      ListenerShim.drainListenerBus(spark.sparkContext)
      val (task0, cpu0) = l.snapshot
      // real distributed work: a shuffle with enough rows to be >0 ms
      val n = spark.range(2000000L).selectExpr("id % 97 AS k")
        .groupBy("k").count().count()
      assert(n === 97L)
      ListenerShim.drainListenerBus(spark.sparkContext)
      val (task1, cpu1) = l.snapshot
      assert(task1 > task0, "executorRunTime must accumulate across the job")
      assert(cpu1 > cpu0, "executorCpuTime must accumulate across the job")
      // per-task CPU cannot exceed task wall by more than measurement
      // slop (executorRunTime is ms-granular; CPU is ns) — a gross
      // violation means the units in snapshot() regressed
      assert(cpu1 - cpu0 <= (task1 - task0) * 2 + 0.25,
        s"cpu ${cpu1 - cpu0}s vs task ${task1 - task0}s — unit mismatch?")

      // an idle interval attributes nothing
      ListenerShim.drainListenerBus(spark.sparkContext)
      val (task2, cpu2) = l.snapshot
      assert(task2 === task1 && cpu2 === cpu1,
        "no job ran — the counters must not move")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
