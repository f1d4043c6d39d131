package graft

import org.apache.spark.sql.DataFrame

/** Registry for per-query persisted helper frames (two-phase rank inputs,
  * label-propagation edge lists, ...). Helpers `track` what they persist;
  * the harness (Verify and Bench after each query's action; the specs that
  * exercise tracked helpers in an afterEach) calls `releaseAll()`, so
  * repeated query runs in one session do not accumulate cached blocks for
  * the session's lifetime.
  *
  * Deliberately NOT tracked: the dedup family's memoized per-document
  * shingle frame (DedupOps.docShingles) — that cache is the family's
  * shared amortization across queries and is bounded at one small row per
  * document.
  */
object CacheTracker {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** register a persisted frame for release after the current query */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** unpersist every tracked frame (no-op on already-released ones).
    * `blocking = true` waits for block removal — Bench uses it so the
    * asynchronous cleanup of one query's caches cannot overlap the next
    * query's timed section. */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = tracked.poll()
    }
  }
}
