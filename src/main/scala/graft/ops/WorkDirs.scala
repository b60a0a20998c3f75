package graft.ops

import java.nio.file.{Files, Path}

/** Temp working-dir hygiene for the query catalog: ~40 queries create a
  * scratch dir for their table storage, and a long bench session sweeping
  * the catalog repeatedly would otherwise accumulate them in /tmp
  * forever. Each PREFIX keeps exactly one live dir — a re-run of the same
  * query replaces (and deletes) its predecessor — and everything still
  * live is removed at JVM exit.
  */
object WorkDirs {

  private val byPrefix =
    scala.collection.concurrent.TrieMap.empty[String, Path]
  @volatile private var hooked = false

  /** One background janitor for predecessor deletion: a lifecycle entry's
    * previous-pass tree holds thousands of files (table data + logs +
    * checkpoints + CRC sidecars), and walking it on the CALLER thread
    * charged the recursive delete to the next pass's measured time. The
    * fresh dir is an independent temp name, so the old tree's removal
    * needs no ordering with the new run — queue it. Bounded: at most one
    * predecessor per prefix is ever pending.
    */
  private lazy val janitor = {
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-workdirs-janitor")
      t.setDaemon(true)
      t
    })
    ex
  }

  /** Fresh temp dir for `prefix` (one per query); the previous dir of
    * the same prefix is deleted (asynchronously), and a shutdown hook
    * reclaims the rest.
    */
  def workDir(prefix: String): String = {
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(
          new Thread(() => {
            // finish queued predecessor deletes, then reclaim live dirs
            janitor.shutdown()
            try janitor.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
            catch { case _: InterruptedException => () }
            byPrefix.values.foreach(delete)
          }, "graft-workdirs"))
        hooked = true
      }
    }
    val p = Files.createTempDirectory(prefix)
    byPrefix.put(prefix, p).foreach { old =>
      try janitor.execute(() => delete(old))
      catch { case _: java.util.concurrent.RejectedExecutionException =>
        delete(old) // JVM already shutting down — fall back to inline
      }
    }
    p.toString
  }

  /** Best-effort recursive delete — cleanup must never fail a query. */
  private def delete(p: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    } catch { case _: Exception => () }
}
