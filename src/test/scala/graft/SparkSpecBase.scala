package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session; tests fork). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpecBase {
  // local[4, 2]: task maxFailures=2 so retry-semantics specs (O3
  // failure injection) can exercise a real task re-attempt — one JVM
  // holds one SparkContext, so the retry specs cannot run their own
  // differently-configured session. Known trade-off: an intermittent
  // task failure elsewhere gets one silent retry before a spec fails;
  // PagedRetrySpec's listener assertion (failed-task count > 0) is the
  // pattern to use when a spec must OBSERVE failures rather than
  // survive them.
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
