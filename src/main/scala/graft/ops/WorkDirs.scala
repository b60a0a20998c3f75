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

  /** Fresh temp dir for `prefix` (one per query); the previous dir of
    * the same prefix is deleted, and a shutdown hook reclaims the rest.
    */
  def workDir(prefix: String): String = {
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(
          new Thread(() => byPrefix.values.foreach(delete), "graft-workdirs"))
        hooked = true
      }
    }
    val p = Files.createTempDirectory(prefix)
    byPrefix.put(prefix, p).foreach(delete)
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
