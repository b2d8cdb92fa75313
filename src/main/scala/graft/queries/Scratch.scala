package graft.queries

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scratch space for query fixtures (synthetic CDF catalogs, dedup /
  * IVF indexes, streaming staging dirs). Everything lives under ONE root
  * that a shutdown hook removes recursively — a long bench/verify JVM that
  * invokes the same query repeatedly stops leaking one corpus-sized
  * directory per call into /tmp; the process lifetime is the cleanup
  * boundary.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(r)))
    r
  }

  /** A fresh directory under the shared root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** A stable per-name directory under the shared root, emptied on each
    * call: repeated invocations of the same query (bench trials, repeated
    * Verify runs) reuse the one path instead of leaving a corpus-sized
    * tree per call to accumulate until JVM exit. Callers are sequential
    * per name (the driver runs queries one at a time; sbt forked tests run
    * suites sequentially), so the clean-then-create is race-free.
    */
  def stableDir(name: String): String = {
    val p = root.resolve(name)
    rmTree(p)
    Files.createDirectories(p)
    p.toString
  }

  /** A stable per-name directory that is created once and KEPT across
    * calls — for per-JVM memoized artifacts (e.g. a prebuilt ANN index
    * probed by many bench trials). */
  def keepDir(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }

  def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
