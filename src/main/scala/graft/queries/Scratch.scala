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

  /** md5 hex of a string — the stable key for per-JVM memoized artifact
    * dirs (full digest, not `String.hashCode`: a 32-bit collision between
    * two sf dirs would silently cross their artifacts). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
