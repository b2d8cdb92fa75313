package graft.engine

import java.time.Instant
import scala.collection.mutable.ArrayBuffer

/** Timestamped in-memory run log — operator O6 in SURVEY.md §2.9.
  *
  * The reference prints and buffers every message (`log_info`,
  * `unload_databricks_data_to_s3.py:27-40` — deliberately avoiding Log4j
  * conflicts) and flushes the buffer to `logs.txt` at job end. Same here:
  * a driver-side buffer (log volume is O(tables), not O(rows) — nothing
  * per-record ever logs) flushed by [[Writers.writeAudit]].
  */
final class RunLog {
  private val messages = ArrayBuffer.empty[String]

  def info(msg: String): Unit = synchronized {
    val line = s"[${Instant.now()}] $msg"
    println(line)
    messages += line
  }

  def lines: Seq[String] = synchronized(messages.toIndexedSeq)
}
