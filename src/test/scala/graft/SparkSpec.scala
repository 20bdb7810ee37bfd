package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, BeforeAndAfterEach}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — specs
  * run in one forked JVM, so `getOrCreate` dedupes). sf0.001 is the
  * fixture scale: large enough to exercise every branch (the synthetic
  * derivations in the operators key off event/doc arithmetic), small
  * enough for sub-second queries.
  *
  * Every test ends with a [[graft.operators.CacheScope.drain]] — the
  * registry-level unpersist of operator-internal persists — so a
  * query's InMemoryRelation can no longer leak into a later test's
  * plan-contract assertions through the shared session. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll
    with BeforeAndAfterEach {
  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `body` with the RocksDB state store provider set on the shared
    * session, restoring the prior value after (transformWithState
    * requires it; the durability spec pins it deliberately). */
  def withRocksDBStateStore[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  override def afterEach(): Unit = {
    graft.operators.CacheScope.drain()
    super.afterEach()
  }

  override def afterAll(): Unit = {
    // keep the session for other suites; SBT tears the JVM down
    super.afterAll()
  }
}
