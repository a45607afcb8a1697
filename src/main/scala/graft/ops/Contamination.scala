package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination check: for every corpus document, the
  * n-gram CONTAINMENT against a (small) benchmark/eval set — the
  * decontamination pass a training pipeline runs before export, so
  * eval items don't leak into training data.
  *
  * containment(d, b) = |sh(d) ∩ sh(b)| / |sh(d)| is asymmetric by
  * design: a training doc that embeds a benchmark item is contaminated
  * regardless of how much longer the doc is.
  *
  * Plan shape: shingle-posting equi-join (corpus postings ⋈ benchmark
  * postings on the shingle) — never doc×doc pairs — so the work is
  * bounded by shared-shingle volume. The benchmark side is
  * eval-set-sized (thousands of items); at open scale it broadcasts
  * and the corpus never shuffles. Output: one row per corpus doc that
  * shares ≥1 shingle with the benchmark — its WORST (max) containment,
  * the offending benchmark doc (ties → smallest id), and the flag.
  */
object Contamination {

  def check(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
            threshold: Double = 0.5): DataFrame = {
    val cp = Dedup.shingleSets(corpus, n)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val bp = Dedup.shingleSets(benchmark, n)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("s"))
    val shared = cp.join(broadcast(bp), "s")
      .groupBy("doc_id", "bench_id")
      .agg(first("n_sh").as("n_sh"), count(lit(1)).as("shared"))
      .withColumn("cont", col("shared").cast("double") / col("n_sh"))
    shared
      .groupBy("doc_id")
      .agg(max(struct(col("cont"), (-col("bench_id")).as("nb"))).as("w"))
      .select(col("doc_id"),
        (-col("w.nb")).as("bench_id"),
        round(col("w.cont"), 4).as("containment"),
        (col("w.cont") >= threshold).cast("bigint").as("contaminated"))
  }

  /** Span-level escalation of [[check]]: for each CONTAMINATED doc,
    * the longest contiguous run of token positions whose shingles the
    * worst benchmark doc shares — the span a decontamination pipeline
    * actually cuts, as inclusive 0-based token offsets
    * [start_tok, end_tok].
    *
    * The expensive positional shingling (`word_shingles_seq`, ordered
    * with duplicates so posexplode's index IS the token offset) runs
    * ONLY on the contaminated hit set — the flagged docs join first,
    * so span work is bounded by hits, never corpus size. Runs are
    * found with the gaps-and-islands trick on the matched positions
    * (pos − row_number is constant within a consecutive run), all
    * partitioned by doc. Ties on run length break to the earliest
    * span. */
  def spans(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
            threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Shingles.register(corpus.sparkSession)
    val hits = check(corpus, benchmark, n, threshold)
      .filter(col("contaminated") === 1)
      .select(col("doc_id"), col("bench_id"), col("containment"))
    val cpos = corpus.join(broadcast(hits), "doc_id")
      .select(col("doc_id"), col("bench_id"), col("containment"),
        posexplode(call_function("word_shingles_seq", col("text"), lit(n)))
          .as(Seq("pos", "s")))
    val bp = Dedup.shingleSets(benchmark, n)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("s"))
    val matched = cpos.join(broadcast(bp), Seq("bench_id", "s"))
    val wPos = Window.partitionBy("doc_id").orderBy("pos")
    val islands = matched
      .withColumn("grp", col("pos") - row_number().over(wPos))
      .groupBy("doc_id", "bench_id", "containment", "grp")
      .agg(min("pos").cast("bigint").as("start_tok"),
        (max("pos") + lit(n - 1)).cast("bigint").as("end_tok"))
    val wLen = Window.partitionBy("doc_id")
      .orderBy((col("end_tok") - col("start_tok")).desc, col("start_tok").asc)
    islands
      .withColumn("rk", row_number().over(wLen))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("bench_id"), col("containment"),
        col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("span_tokens"))
  }
}
