package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase per-group top-k.
  *
  * A single `row_number` window keyed by a LOW-cardinality group column
  * concentrates each whole group into one task — at 100 TB, five
  * segments means five hot sorters. Phase 1 ranks inside every
  * (group, input-partition) slice and keeps the local top-k; the k
  * global winners always survive their own slice (anything ranked
  * above them locally is also ahead of them globally), so the final
  * per-group window ranks at most k·partitions survivors and the
  * result is IDENTICAL to the single-window form — which is exactly
  * what the DuckDB oracles compute.
  *
  * `orderCols` must be a total order (include a unique tie-break
  * column) or local and final ranks could disagree on ties.
  */
object TopK {

  /** Adds `rankName` (bigint, 1-based) and keeps rows with rank ≤ k. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int, rankName: String = "rn"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val wLocal = Window.partitionBy(groupCols :+ col("_tk_pid"): _*).orderBy(orderCols: _*)
    val wFinal = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("_tk_pid", spark_partition_id())
      .withColumn("_tk_lrn", row_number().over(wLocal))
      .filter(col("_tk_lrn") <= k)
      .withColumn(rankName, row_number().over(wFinal).cast("bigint"))
      .filter(col(rankName) <= k)
      .drop("_tk_pid", "_tk_lrn")
  }
}
