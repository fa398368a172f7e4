package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (UTC, small shuffle fan-out). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Smallest driver-generated scale factor — smoke-scale inputs. */
  val Sf = "/root/testdata/sf0.001"

  /** The 10× dir (the driver's CORRECTNESS scale) — for the few tests
    * that need multi-partition volume (e.g. native-as-of parity). */
  val Sf01 = "/root/testdata/sf0.01"

  /** Run `body` with size-based auto-broadcast disabled, so an
    * equijoin's keys surface as `hashpartitioning(...)` exchanges in
    * the pre-execution plan even at smoke scale (where AQE would
    * otherwise broadcast everything and hide the shuffle keys).
    * Explicit broadcast() hints still win — only the size-based
    * choice is suppressed. Restores the prior threshold: the session
    * is shared across suites. */
  def withForcedShuffleJoins[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prior)
  }
}

object SparkSpec {
  // local[4, 4]: the second number is task maxFailures — local mode
  // defaults to 1 (first failure kills the job), which would make the
  // RetryDeterminismSpec's inject-once failing partition fatal instead
  // of retried. Production clusters retry by default; the suite should
  // run under the semantics the library ships into.
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4, 4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
