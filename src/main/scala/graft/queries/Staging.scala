package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Observability + scale-gating for the per-JVM staged artifacts (dedup
  * sketches, PQ/IVF models, ANN exact sides, streaming input dirs).
  *
  * Two concerns, both about keeping the staging discipline HONEST:
  *
  *   1. '''Observability''' — every staging build logs ONE stderr line
  *      `[stage] name=<artifact> sec=<s>`, so a flagged bench number on a
  *      staged query can be decomposed from logs alone (is the outlier the
  *      one-time staging build or the steady-state serve path?) without a
  *      profiling session. This is the q102 per-stage-timing discipline
  *      applied to staging: a cold JVM's first trial of a model-served
  *      query carries the whole training cost, and the log line is the
  *      evidence that separates it from a real serve-path regression.
  *
  *   2. '''Scale gate''' — parquet staging is a FIXED cost (write job +
  *      footer reads on every consumer) that only amortizes when the
  *      derivation it replaces is meaningfully more expensive. Below a
  *      fixture-size threshold the stagers skip parquet and hold the
  *      (tiny) staged relation as an in-memory `localCheckpoint` instead:
  *      still computed exactly once per JVM by the very same plan — the
  *      staged≡fresh equivalence specs and every DuckDB oracle are
  *      untouched — but with zero parquet round-trip. The mirror of the
  *      reference's `target_partitions` mode, which exists precisely to
  *      skip a count job the workload size doesn't justify
  *      (unload_databricks_data_to_s3.py:232-236): never pay a fixed cost
  *      the data doesn't earn back.
  *
  * The gate reads FILESYSTEM metadata only (recursive byte-sum of the
  * fixture table dir, cached per path) — no Spark job, no row count. The
  * threshold is a system property (`graft.staging.minBytes`, default
  * 256 KiB) so tests can force either path deterministically: the
  * driver-generated fixtures sit at ~65 KB (documents) / ~190 KB
  * (embeddings) for sf≤0.01 vs ~595 KB / ~800 KB at sf0.1, a 3-4×
  * separation around the default.
  */
object Staging {

  /** Default byte threshold below which stagers keep artifacts in memory. */
  val DefaultMinBytes: Long = 256L * 1024

  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Recursive byte-sum of a fixture dir/file — filesystem metadata only,
    * cached per path (the driver's testdata never changes inside a JVM). */
  def pathBytes(path: String): Long =
    bytesCache.computeIfAbsent(path, _ => {
      val p = Paths.get(path)
      if (!Files.exists(p)) 0L
      else {
        val s = Files.walk(p)
        try s.filter(Files.isRegularFile(_: Path))
          .mapToLong(Files.size(_: Path)).sum()
        finally s.close()
      }
    })

  /** The gate knob — read per call (NOT cached) so a spec can flip the
    * property and exercise both paths inside one JVM. */
  def minStageBytes: Long =
    sys.props.get("graft.staging.minBytes").map(_.toLong)
      .getOrElse(DefaultMinBytes)

  /** Should this fixture table be staged to parquet (true) or held as an
    * in-memory localCheckpoint (false)? */
  def stageToParquet(tableDir: String): Boolean =
    pathBytes(tableDir) >= minStageBytes

  /** Run a staging build and emit the one-line audit record. stderr, not
    * stdout: Bench's stdout is a parsed JSON contract. */
  def timed[T](name: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val r = build
    System.err.println(
      f"[stage] name=$name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }
}
