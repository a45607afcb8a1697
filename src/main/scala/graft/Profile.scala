package graft
// Dev harness: stage-level timing of the expensive pipeline operators so
// perf work targets the actual hot stage, not a guess (BENCH_r02 showed
// dedup_minhash at 91 s — find out which stage).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.sources.Tables

object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n  = df.count()
    println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.Sessions.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan

    time("shingleSets")(Dedup.shingleSets(docs, 3))
    time("postings")(Dedup.shingleSets(docs, 3).select(col("doc_id"), explode(col("sh")).as("s")))
    time("minhashSignatures")(Dedup.minhashSignatures(docs, 3, 128))
    time("minhashLsh_full")(Dedup.minhashLsh(docs, 3, 128, 16, 0.8))
    time("minhash_candidates")(Dedup.lshCandidates(docs, 3, 128, 16, 1000))
    time("ngramJaccard")(Dedup.ngramJaccard(docs, 3, 0.8, 50))
    time("simhashSignatures")(Dedup.simhashSignatures(docs))
    time("simhashPairs")(Dedup.simhashPairs(docs, 3))
    val emb = Tables.embeddings(spark, sfDir)
    emb.count()
    time("embeddingNearDup")(Dedup.embeddingNearDup(emb, 0.35))
    time("cluster_edges_only")(Dedup.ngramJaccard(docs, 3, 0.8, 50).select("id1", "id2"))
    time("cluster_full")(graft.ops.Cluster.dedupClusters(docs,
      Dedup.ngramJaccard(docs, 3, 0.8, 50)))
    spark.stop()
  }
}
