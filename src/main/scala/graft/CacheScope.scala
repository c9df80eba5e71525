package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle scope for query-local caches.
  *
  * Several registry queries cache an internally-reused frame (shingle
  * sets, minhash signatures, LSH buckets) whose consumers only
  * materialize AFTER the query function returns — so the query body
  * cannot `finally`-unpersist the way an internally-materializing
  * operator (q56's clustersDf) does: the cache would be dropped before
  * it is ever used. In a fresh-session-per-run process (Verify, Bench)
  * that leak is invisible — session teardown frees it — but a
  * long-lived process serving the full registry accumulates every
  * query's storage until the session dies.
  *
  * [[cached]] replaces bare `.cache()` at those sites: it still caches,
  * and additionally REGISTERS the frame with the innermost active scope
  * on the current thread. [[withScope]] brackets "build + materialize +
  * consume" and unpersists every registered frame on exit (normal or
  * exceptional). With no active scope, [[cached]] degrades to exactly
  * `.cache()` — ad-hoc/spec callers keep today's semantics.
  *
  * Scopes nest: an inner scope only frees frames cached inside it.
  * Registration is thread-local because scope extent is a dynamic
  * call-stack property — concurrent query runs on other threads must
  * not have their caches freed by this thread's scope exit.
  */
object CacheScope {
  private val active =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** Cache `df`; if a scope is active on this thread, the frame is
    * unpersisted when that scope exits.
    *
    * Idempotent by PLAN identity: two operators sharing a subframe
    * (q56's clusters and q100's degrees both route through
    * verifiedPairs → signedSets) would otherwise each call `.cache()`
    * on the same analyzed plan — harmless (CacheManager keeps one
    * entry) but it logs `WARN CacheManager: Asked to cache already
    * cached data`, and a wall of benign warnings is exactly the place
    * a REAL double-cache bug hides. The lookup is the same
    * canonicalized-plan probe CacheManager itself uses; an
    * already-cached frame is NOT re-registered either: the call site
    * that first cached it (possibly an enclosing scope) owns the
    * unpersist — re-registering here would let an inner scope free a
    * cache its outer consumers still need. */
  def cached(df: DataFrame): DataFrame = {
    // sql.DataFrame is the interface type in Spark 4; CacheManager's
    // probe takes the classic implementation (always what a local
    // session hands out)
    val already = df.sparkSession.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isDefined
    if (!already) {
      df.cache()
      val buf = active.get()
      if (buf != null) buf += df
    }
    df
  }

  /** Run `body`; on exit unpersist every frame [[cached]] inside it. */
  def withScope[T](body: => T): T = {
    val outer = active.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    active.set(buf)
    try body
    finally {
      active.set(outer)
      buf.foreach(d => scala.util.Try(d.unpersist()))
    }
  }
}
