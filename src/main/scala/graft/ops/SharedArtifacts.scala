package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBarrier}

/** Registry of long-lived shared materializations (cross-query memos
  * like [[Suffix.corpusRanks]]).
  *
  * Bench drops every persistent RDD between timed queries so each key
  * is measured against a clean block store — correct for PRIVATE
  * checkpoints, but a shared artifact is steady-state infrastructure
  * (the whole point of the memo is that later family members reuse it),
  * and sweeping it both breaks live readers and re-times the build per
  * key. Checkpoints created here register their RDD id; the sweep
  * exempts registered ids. Consumers still liveness-check their blocks
  * (a swept or dead-context artifact rebuilds rather than throws).
  */
object SharedArtifacts {

  private val ids = scala.collection.concurrent.TrieMap.empty[Int, Unit]

  // Bench-honesty instrumentation (VERDICT r16 item 5): per-key bench
  // times depend on execution order once artifacts are shared — the
  // FIRST consumer pays the build, later ones read the memo. The
  // memos report hits, checkpoint() counts builds, and Bench diffs the
  // counters around each timed query to label it cold (paid a shared
  // build) or shared (read one) in bench_out.json, so regressions can
  // be adjudicated without cross-referencing memo internals.
  private val builds = new java.util.concurrent.atomic.AtomicLong(0)
  private val hits = new java.util.concurrent.atomic.AtomicLong(0)

  /** Called by a memo when it serves an already-built artifact. */
  def noteHit(): Unit = { hits.incrementAndGet(); () }

  /** (builds, hits) so far — diff around a query to classify it. */
  def counters: (Long, Long) = (builds.get, hits.get)

  /** Lazy local checkpoint (stats reset, as [[PlanBarrier.cut]]) whose
    * persisted RDD id is registered as sweep-exempt. Returns the
    * checkpointed frame and the id for liveness checks. */
  def checkpoint(df: DataFrame): (DataFrame, Int) = {
    val (cp, id) = GraftBarrier.localCheckpointTracked(df)
    ids.put(id, ())
    builds.incrementAndGet()
    (cp, id)
  }

  /** True if `rddId` belongs to a registered shared artifact. */
  def isProtected(rddId: Int): Boolean = ids.contains(rddId)

  /** Cheap content fingerprint of a corpus dir — the (path, size,
    * mtime) digest of every data file under it. Memo keys fold this in
    * (ADVICE r16) so regenerating the parquet corpus IN-PLACE within
    * one application invalidates the memo instead of silently serving
    * the previous corpus's artifacts. Listing-only (no data read); a
    * distributed deployment keys on its table format's snapshot id
    * instead. */
  def corpusFingerprint(dir: String): String = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      Iterator(f) ++ Option(f.listFiles()).iterator.flatMap(_.iterator.flatMap(walk))
    val digest = walk(new java.io.File(dir))
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .toSeq.sorted.mkString("|")
    java.lang.Long.toHexString(
      digest.foldLeft(1125899906842597L)((h, c) => 31 * h + c))
  }
}
