package graft

/** The library-consumer contract of [[Caches]]: a query's in-query
  * persists are registered, release() frees exactly those — and never a
  * cache the consumer made themselves (the reason release() exists
  * instead of pointing consumers at the blunt catalog.clearCache()). */
class CachesSpec extends SparkSpec {

  test("release unpersists the engine's registered relations, not the consumer's") {
    spark.catalog.clearCache()
    Caches.release() // drain whatever earlier suites registered
    assert(Caches.liveCount === 0)
    // a consumer-owned cache that must survive release()
    val mine = Tables.events(spark, sf).limit(10).cache()
    mine.count()
    // q112 persists its trigram relation through Caches
    operators.AuditOps.queries("q112_source_overlap")(spark, sf).count()
    assert(Caches.liveCount > 0, "query did not register its persist")
    Caches.release()
    assert(Caches.liveCount === 0)
    assert(mine.storageLevel.useMemory, "consumer cache must survive release()")
    mine.unpersist(blocking = true)
  }

  test("release invalidates the envelope memo so reuse re-persists, not recomputes-uncached") {
    Caches.release()
    val before = contentops.ContentOps.queries("q50_envelope_parse")(spark, sf)
    before.count()
    assert(Caches.liveCount > 0, "envelope build did not register")
    Caches.release()
    // after release the memo is dropped: the next query registers a FRESH
    // persisted envelope instead of silently reusing an unpersisted plan
    contentops.ContentOps.queries("q50_envelope_parse")(spark, sf).count()
    assert(Caches.liveCount > 0, "post-release reuse did not re-persist the envelope")
    Caches.release()
  }
}
