package graft

import java.nio.file.{Files, Paths}

import graft.ops.WorkDirs

/** Temp-dir hygiene: one live dir per prefix, prior dirs reclaimed. */
class WorkDirsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("a re-used prefix replaces (and deletes) its previous dir; " +
      "distinct prefixes coexist") {
    val a1 = WorkDirs.workDir("graft_wdspec_a")
    Files.write(Paths.get(a1, "x.txt"), "x".getBytes)
    val b = WorkDirs.workDir("graft_wdspec_b")
    val a2 = WorkDirs.workDir("graft_wdspec_a")
    assert(a1 != a2)
    // predecessor deletion is asynchronous (a background janitor — the
    // recursive walk must not bill the next pass's measured time); the
    // contract is reclamation, so poll briefly
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (Files.exists(Paths.get(a1)) && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(!Files.exists(Paths.get(a1)),
      "previous same-prefix dir must be reclaimed")
    assert(Files.exists(Paths.get(a2)) && Files.exists(Paths.get(b)),
      "the live dir of each prefix must survive")
  }

  test("catalog query prefixes are unique — a collision would let one " +
      "query delete another's live table storage") {
    // scan the source of the two catalog files for workDir prefixes; the
    // one-live-dir-per-prefix contract makes duplicates destructive
    // resolve against the repo root (walk up to build.sbt) so the test
    // holds regardless of the runner's working directory
    val root = Iterator.iterate(
        Paths.get(sys.props("user.dir")).toAbsolutePath)(_.getParent)
      .takeWhile(_ != null)
      .find(d => Files.exists(d.resolve("build.sbt")))
      .getOrElse(fail("could not locate repo root (no build.sbt upward)"))
    val srcs = Seq(
      "src/main/scala/graft/ops/Coverage.scala",
      "src/main/scala/graft/streaming/StreamOps.scala")
      .map(p => new String(Files.readAllBytes(root.resolve(p)), "UTF-8"))
    val prefixes = srcs.flatMap(
      """workDir\("([a-z_0-9]+)"\)""".r.findAllMatchIn(_).map(_.group(1)))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate workDir prefixes: ${dups.mkString(",")}")
  }
}
