package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Move the single `part-*<ext>` file Spark wrote in `from` into dir `to`
  * as `name` — the file-drop step the streaming queries/specs use to feed
  * a watched directory one file at a time. The directory listing stream is
  * closed explicitly (Files.list holds an open fd until closed, and a
  * drop-per-batch caller would otherwise leak one per call).
  */
object FileDrop {
  def moveSinglePart(from: String, to: String, name: String, ext: String): Unit = {
    val listing = Files.list(Paths.get(from))
    val src =
      try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(ext))
        .getOrElse(sys.error(s"no *$ext part file in $from"))
      finally listing.close()
    Files.createDirectories(Paths.get(to))
    Files.move(src, Paths.get(to, name), StandardCopyOption.REPLACE_EXISTING)
  }
}
