package graft.ops

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Registry for intermediate persists created while BUILDING a lazy query
  * (LSH band tables, inverted shingle indexes, curation `kept2`). The
  * builder can't unpersist at build time — the cache is only populated when
  * the caller later runs an action — so the runner (Verify/Bench/user code)
  * calls [[releaseAll]] once the consuming action finishes. Without this a
  * long session accumulates band tables and re-persisting the same logical
  * plan trips `CacheManager: Asked to cache already cached data` warnings.
  */
object Caches {
  private val live = mutable.Buffer[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    live += p
    p
  }

  /** Unpersist every registered frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}

/** SPARK_GRAFT_TIMING=1 phase timer for query-internal profiling — the
  * query-side sibling of the VersionedTable commit-path timer (same env
  * switch, same stderr format), so a slow catalog entry can be broken into
  * its eager phases without temporary instrumentation. Zero cost unset.
  */
object Phases {
  private val timing: Boolean =
    sys.env.get("SPARK_GRAFT_TIMING").contains("1")

  def timed[A](label: String)(f: => A): A =
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[q-timing] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
}
