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
}
