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

  /** args: "streams" → stage-level timing of the streaming family
    * (per-micro-batch durationMs breakdown via StreamingQueryProgress);
    * no args → the original dedup pipeline profile. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.Sessions.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("streams")) { profileStreams(spark, sfDir); spark.stop(); return }
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

  private def profileStreams(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStreams
    // A/B knobs for the streaming-overhead experiment
    sys.env.get("GRAFT_STREAM_PARTS").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    sys.env.get("GRAFT_CKPT_CHECKSUM").foreach(v =>
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", v))
    // one warm streaming run so session/codegen startup is excluded
    EventStreams.windowedAgg(spark, "/root/testdata/sf0.001").count()

    def wall(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"STREAM $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    wall("range_join")(EventStreams.streamRangeJoin(spark, sfDir).count())
    wall("hll_refresh")(EventStreams.distinctUsersIncremental(spark, sfDir).count())
    wall("dedup")(EventStreams.dedupedCounts(spark, sfDir).count())

    // per-micro-batch breakdown of the range join replicated inline
    val src = spark.readStream
      .schema(EventStreams.eventsSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("sts"))
      .withWatermark("sts", "1 hour")
    val errors = src.filter(col("event_type") === "error")
      .select(col("user_id").as("euser"), col("ts").as("ets"))
      .withWatermark("ets", "1 hour")
    val joined = signups.join(errors,
      expr("user_id = euser AND ets >= sts AND ets < sts + interval 1 hour"))
    val out = graft.sources.Scratch.dir("graft_profile_rjoin_")
    val q = joined.writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so =>
        println(s"  state rows=${so.numRowsTotal} commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}"))
    }
  }
}
