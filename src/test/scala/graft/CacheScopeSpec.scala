package graft

import org.apache.spark.storage.StorageLevel
import graft.operators.CacheScope

/** The begin()-token scoping of operator-internal persists: two
  * queries in flight on separate threads drain ONLY their own frames
  * — the round-16 close of the round-15 single-query-contract note. */
class CacheScopeSpec extends SparkSpec {

  test("two interleaved scopes: each drain unpersists only its own frames") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    // two "queries", each on its own thread, each persisting one
    // internal frame under its own token; the barrier holds both in
    // flight at once
    val ready = new java.util.concurrent.CyclicBarrier(2)
    @volatile var fa: org.apache.spark.sql.DataFrame = null
    @volatile var fb: org.apache.spark.sql.DataFrame = null
    @volatile var ta: CacheScope.Token = null
    @volatile var tb: CacheScope.Token = null
    def worker(tag: Int, set: (org.apache.spark.sql.DataFrame,
        CacheScope.Token) => Unit) = new Thread(() => {
      val t = CacheScope.begin()
      val f = CacheScope.persist(
        Seq(tag, tag + 1).toDF("v").groupBy($"v").count())
      f.collect() // materialize the cache
      set(f, t)
      ready.await()
      ()
    })
    val w1 = worker(100, (f, t) => { fa = f; ta = t })
    val w2 = worker(200, (f, t) => { fb = f; tb = t })
    w1.start(); w2.start(); w1.join(); w2.join()
    assert(fa.storageLevel != StorageLevel.NONE &&
      fb.storageLevel != StorageLevel.NONE,
      "both in-flight frames must be persisted")
    // query A completes: ONLY its frame unpersists
    CacheScope.drain(ta)
    assert(fa.storageLevel == StorageLevel.NONE, "A's frame must drain")
    assert(fb.storageLevel != StorageLevel.NONE,
      "A's drain must not touch B's in-flight frame — the round-15 bug")
    CacheScope.drain(tb)
    assert(fb.storageLevel == StorageLevel.NONE, "B's frame must drain")
  }

  test("serial callers without begin() keep the old drain() behavior") {
    import spark.implicits._
    val f = CacheScope.persist(Seq(1, 2).toDF("v").groupBy($"v").count())
    f.collect()
    assert(f.storageLevel != StorageLevel.NONE)
    CacheScope.drain()
    assert(f.storageLevel == StorageLevel.NONE,
      "the root-scope drain must keep clearing serial registrations")
  }
}
