package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SharedArtifacts}
import graft.sources.Tables

/** Process-wide memo of the batch capstones' shared prelude (VERDICT
  * r15 item 4): `pipeline_e2e`, `_v2` and `_v4` all open with the SAME
  * stages over the same parquet dir — raw docs → exact dedup (min
  * doc_id per normalized text) → substring-survivor filter (≤20%
  * duplicated-span coverage) — and Bench/Verify run them as
  * independent queries inside one session, so without sharing, the
  * suffix-rank construction and the exact-dedup shuffle rebuild
  * identically per key. The memo follows [[graft.ops.Suffix.corpusRanks]]
  * to the letter: each stage is a SHARED localCheckpoint
  * ([[SharedArtifacts.checkpoint]] — exempt from Bench's per-query
  * block sweep), built at most once per (session, corpus dir),
  * materialized eagerly in dependency order, and liveness-checked on
  * every hit so a swept entry rebuilds instead of throwing. Results
  * are byte-identical to a private rebuild (exact dedup's winner is
  * the deterministic min id; coverage is a pure function of the
  * survivor corpus). v3 is NOT a consumer: its PII quarantine runs
  * BEFORE exact dedup, so its survivor chain is a different corpus. */
private[queries] object CapstonePrelude {

  private final case class Entry(docs: DataFrame, s1: DataFrame,
                                 rddIds: Seq[Int])
  private final case class SubEntry(s2: DataFrame, rddIds: Seq[Int])
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Entry]
  private val subMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), SubEntry]

  /** (raw docs, exact-dedup survivors), each (doc_id, text, source)
    * and shared-checkpointed. The substring stage is NOT built here —
    * `pipeline_e2e` never consumes it, so its suffix construction
    * stays lazy in [[withSubstring]]. */
  def base(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      memo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); (e.docs, e.s1)
        case _ =>
          val (docs, dId) = SharedArtifacts.checkpoint(
            Tables.documents(s, dir).select("doc_id", "text", "source"))
          docs.count() // eager, in dependency order (corpusRanks rule)
          val (s1, s1Id) = SharedArtifacts.checkpoint(
            docs.groupBy(Dedup.normText(col("text")).as("norm"))
              .agg(min("doc_id").as("doc_id"))
              .join(docs, "doc_id").select("doc_id", "text", "source"))
          s1.count()
          memo(key) = Entry(docs, s1, Seq(dId, s1Id))
          (docs, s1)
      }
    }

  private final case class ClEntry(cl: DataFrame, rddIds: Seq[Int])
  private val clMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), ClEntry]

  /** Near-dup family table (doc_id, cluster_id) over [[withSubstring]]'s
    * survivors — the identical `Cluster.dedupClusters(ngramJaccard(s2))`
    * call made by pipeline_e2e_v2, _v4's hard branch, and _v3's
    * empty-quarantine fast path. */
  def clusters(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      clMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); e.cl
        case _ =>
          val (_, _, s2) = withSubstring(s, dir)
          val (cl, id) = SharedArtifacts.checkpoint(
            graft.ops.Cluster.dedupClusters(s2,
              Dedup.ngramJaccard(s2, n = 3, threshold = 0.8, maxDF = 50)))
          cl.count()
          clMemo(key) = ClEntry(cl, Seq(id))
          cl
      }
    }

  private final case class ClfEntry(audit: DataFrame, w: DataFrame,
                                    rddIds: Seq[Int])
  private val clfMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), ClfEntry]

  /** The frozen FULL-CORPUS quality classifier (train audit, weight
    * table) — quality_clf_train, quality_clf_score, pipeline_e2e_v2
    * and _v3 all make the identical `QualityClf.train(documents)`
    * call, which costs ~8 corpus reductions. Results are bounded by
    * construction (8 audit rows, ≤ buckets+1 weights), so the memo
    * shares two tiny checkpoints; determinism is the trainer's own
    * contract (fixed rounds, integer updates, halving schedule). */
  def clfFull(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      clfMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); (e.audit, e.w)
        case _ =>
          val (audit0, w0) = graft.ops.QualityClf.train(
            Tables.documents(s, dir).select("doc_id", "text"))
          val (audit, aId) = SharedArtifacts.checkpoint(audit0)
          audit.count()
          val (w, wId) = SharedArtifacts.checkpoint(w0)
          w.count()
          clfMemo(key) = ClfEntry(audit, w, Seq(aId, wId))
          (audit, w)
      }
    }

  /** [[base]] plus the substring-survivor stage (built at most once
    * per corpus, on first demand from v2/v4). */
  def withSubstring(s: SparkSession,
                    dir: String): (DataFrame, DataFrame, DataFrame) =
    synchronized {
      val (docs, s1) = base(s, dir)
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      subMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); (docs, s1, e.s2)
        case _ =>
          // r17: reuse the FULL-corpus suffix ranks (the corpusRanks
          // memo the dedup_substring family already builds) RESTRICTED
          // to the exact-dedup survivors, instead of constructing a
          // private doubling chain over s1. Rank equality is textual
          // identity — independent of which corpus built the ranks —
          // so the duplicate-frequency counts over s1's positions are
          // byte-identical to an s1-private construction, and the
          // restriction is one co-keyed semi-join per table.
          val (pos, lv) = graft.ops.Suffix.corpusRanks(
            Tables.documents(s, dir), dir)
          val ids = s1.select("doc_id")
          val pre = (pos.join(ids, "doc_id"),
            Map(16 -> lv(16).join(ids, "doc_id")))
          val sub = graft.ops.Suffix.dupSpanStats(
            s1.select("doc_id", "text"), spanLen = 16, pre = Some(pre))
          val (s2, s2Id) = SharedArtifacts.checkpoint(
            s1.join(sub.filter(col("dup_tokens") * 5 <= col("n_tokens"))
              .select("doc_id"), "doc_id"))
          s2.count()
          subMemo(key) = SubEntry(s2, Seq(s2Id))
          (docs, s1, s2)
      }
    }
}
