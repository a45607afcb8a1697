package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents (in stable doc_id order) to
  * fixed-token-budget bins by global running token count — the
  * concat-and-chunk step that turns a document corpus into training
  * sequences of `maxTokens` tokens.
  *
  * The global cumulative sum is computed as a TWO-LEVEL prefix sum so
  * no stage ever sorts the whole corpus in one task:
  *
  *   1. docs group into coarse blocks (`doc_id div blockSize`); a
  *      windowed cumsum runs WITHIN each block — distributed across
  *      the block partitioning;
  *   2. per-block totals (one tiny row per block — corpus/blockSize
  *      rows, bounded) get their own prefix sum, giving each block's
  *      starting offset;
  *   3. global cum-before = block offset + within-block cumsum − own
  *      count; bin = cum_before div maxTokens.
  *
  * Identical by construction to the single-window global cumsum (the
  * DuckDB oracle computes it that way), without the single-partition
  * window over raw rows that formulation needs.
  */
object Pack {

  /** Per-doc bin assignment: doc_id, n_tokens, cum_before, bin. */
  def sequencePack(docs: DataFrame, maxTokens: Long = 2048L,
                   blockSize: Long = 1024L): DataFrame =
    packCounts(docs.select(col("doc_id"),
      size(Dedup.tokens(col("text"))).cast("bigint").as("n_tokens")),
      maxTokens, blockSize)

  /** [[sequencePack]] on PRE-COUNTED per-doc token masses — the entry
    * point for tokenizer-faithful packing, where `n_tokens` comes from
    * a learned segmentation (vocab_bpe_apply's symbol counts) instead
    * of the whitespace count. Input: (doc_id, n_tokens). */
  def packCounts(counts: DataFrame, maxTokens: Long = 2048L,
                 blockSize: Long = 1024L): DataFrame = {
    val t = counts.select(col("doc_id"),
        col("n_tokens").cast("bigint").as("n_tokens"))
      .withColumn("blk", expr(s"doc_id div ${blockSize}L"))
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = t.withColumn("cum_in", sum("n_tokens").over(wIn))
    // tiny table: one row per block; its prefix-sum window is a single
    // task over corpus/blockSize rows — bounded, not the raw corpus
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("blk").agg(sum("n_tokens").as("blk_sum"))
      .withColumn("blk_off", coalesce(sum("blk_sum").over(wBlk), lit(0L)))
      .select("blk", "blk_off")
    within.join(broadcast(offsets), "blk")
      .withColumn("cum_before", col("blk_off") + col("cum_in") - col("n_tokens"))
      .withColumn("bin", expr(s"cum_before div ${maxTokens}L"))
      .select("doc_id", "n_tokens", "cum_before", "bin")
  }
}
