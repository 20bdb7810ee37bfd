package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for OPERATOR-INTERNAL persists — the multi-consumer frames
  * a query pins so its plan subtrees don't re-expand per consumer (the
  * ts5 lesson). A `persist()` inside a query used to have no matching
  * `unpersist()`: the InMemoryRelation outlived the query, leaked into
  * later plans in the same session (plan-contract tests saw cached
  * subtrees substitute for the scans they pin), and was only reclaimed
  * by the harness's blanket `cacheManager.clearCache()`.
  *
  * Every internal persist now routes through [[persist]] (which also
  * owns the idempotence guard), and the completion point — Verify's
  * write, Bench's timed collect, each spec's `afterEach` — calls
  * [[drain]]: the registry-level unpersist the round-13 review asked
  * for. Draining an already-cleared frame is a no-op, so the blanket
  * clearCache in the harness stays harmless belt-and-braces.
  *
  * CONTRACT — one logical query at a time per process: the registry is
  * a single process-global queue, sized for the harness's (and any
  * batch caller's) run-query-then-drain loop. A caller that never
  * drains accumulates strong references unboundedly, and two callers
  * interleaving queries on a shared session will unpersist each
  * other's in-flight frames at their own drain points (correctness is
  * unaffected — an unpersisted frame recomputes — but the cache
  * benefit is lost). A concurrent-serving deployment would scope
  * registrations per query (a begin()-token API); the harness's
  * serial contract keeps the global queue the honest minimal form.
  *
  * Deliberately NOT drained here: persists with an explicit paired
  * `unpersist()` in their own operator (d6's edge/pair checkpoint
  * dance) and streaming `foreachBatch` persists that unpersist at
  * batch end — those already complete their own lifecycle. */
object CacheScope {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (if not already persisted) and register it for
    * [[drain]]. Returns `df` for chaining. */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      frames.add(df)
      ()
    }
    df
  }

  /** Unpersist every frame registered since the last drain. Blocking
    * is unnecessary: the next query's plans only care that the
    * registration is gone from the cache manager. */
  def drain(): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = frames.poll()
    }
  }
}
