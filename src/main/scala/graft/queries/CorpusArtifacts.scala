package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Cluster, Dedup, SharedArtifacts}
import graft.sources.Tables

/** Process-wide memo of the FULL-CORPUS near-dup family artifacts —
  * the [[CapstonePrelude]] pattern applied to the dedup family's own
  * keys. Eight keys (dedup_ngram_jaccard, dedup_source_report,
  * dedup_cluster, dedup_effective_tokens, dedup_family_sizes,
  * dedup_cluster_purity, split_leakage, graph_pagerank) make the
  * byte-identical `ngramJaccard(documents, 3, 0.8, 50)` call, and five
  * of them also run the identical CC collapse on its output; a
  * production system computes the family table ONCE and every
  * downstream view reads it — that steady-state is what the memo
  * models. Shared sweep-exempt checkpoints, eager in dependency
  * order, liveness-checked (the corpusRanks conventions); results are
  * deterministic (DF-capped posting buckets + exact verify; min-id CC
  * labels), so every consumer is byte-identical to a private rebuild. */
private[queries] object CorpusArtifacts {

  private final case class Entry(df: DataFrame, rddIds: Seq[Int])
  private val pairMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Entry]
  private val clMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Entry]

  private final case class HnswEntry(ix: graft.ops.Hnsw.Index,
                                     rddIds: Seq[Int])
  private val hnswMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), HnswEntry]

  /** The full-corpus layered-graph ANN index — `Hnsw.build(embeddings,
    * m = 6)` is made identically by ann_hnsw, ann_hnsw_recall and
    * ann_hnsw_beam_sweep (the persisted-index posture: build once,
    * search at any beam width). Every member table is re-anchored as a
    * sweep-exempt shared checkpoint, materialized in dependency order
    * (node table first — the adjacencies' private lineage roots
    * there). ann_hnsw_append is NOT a consumer: its frozen-history
    * graph + shard attachment is the operator's own story. */
  def hnswIndex(s: SparkSession, dir: String): graft.ops.Hnsw.Index =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      hnswMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); e.ix
        case _ =>
          val ix0 = graft.ops.Hnsw.build(Tables.embeddings(s, dir), m = 6,
            materializeUppers = true)
          val parts = Seq(ix0.e, ix0.adj2, ix0.adj1, ix0.adj0)
            .map(SharedArtifacts.checkpoint)
          parts.foreach(_._1.count()) // eager, dependency order
          val ix = graft.ops.Hnsw.Index(parts(0)._1, parts(1)._1,
            parts(2)._1, parts(3)._1, ix0.entry)
          hnswMemo(key) = HnswEntry(ix, parts.map(_._2))
          ix
      }
    }

  /** Verified near-dup pairs over the full documents table —
    * `Dedup.ngramJaccard(documents, n = 3, threshold = 0.8, maxDF = 50)`,
    * full output columns. */
  def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      pairMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); e.df
        case _ =>
          val (df, id) = SharedArtifacts.checkpoint(
            Dedup.ngramJaccard(Tables.documents(s, dir),
              n = 3, threshold = 0.8, maxDF = 50))
          df.count()
          pairMemo(key) = Entry(df, Seq(id))
          df
      }
    }

  /** Converged CC family labels (doc_id, cluster_id) over
    * [[nearDupPairs]] for the full documents table. */
  def nearDupClusters(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val sc = s.sparkContext
      val key = (sc.applicationId,
        dir + "@" + SharedArtifacts.corpusFingerprint(dir))
      clMemo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); e.df
        case _ =>
          val (df, id) = SharedArtifacts.checkpoint(
            Cluster.dedupClusters(Tables.documents(s, dir),
              nearDupPairs(s, dir)))
          df.count()
          clMemo(key) = Entry(df, Seq(id))
          df
      }
    }
}
