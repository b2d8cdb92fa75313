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

  def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
