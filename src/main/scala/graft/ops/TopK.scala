package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k, two-phase BY THE OPTIMIZER.
  *
  * A single `row_number` window keyed by a LOW-cardinality group column
  * would concentrate each whole group into one task — at 100 TB, five
  * segments means five hot sorters. Spark's rank-limit pushdown
  * (`InferWindowGroupLimit`, Spark 3.5+) rewrites exactly this shape —
  * rank-like window + `rank <= k` filter — into a PARTIAL
  * `WindowGroupLimit` before the exchange and a FINAL one after: every
  * input partition is pruned to its local per-group top-k map-side, so
  * only k·partitions survivors per group ever shuffle, and the hot
  * final sorter ranks a bounded sliver. One shuffle total — strictly
  * better than a hand-rolled two-phase window pair, which pays a
  * second exchange for the local phase (PlanSpec pins the
  * Partial/Final pair so a regression to the unpruned shape fails the
  * build).
  *
  * `orderCols` must be a total order (include a unique tie-break
  * column) or ranks are nondeterministic across retries.
  */
object TopK {

  /** Adds `rankName` (bigint, 1-based) and keeps rows with rank ≤ k. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int, rankName: String = "rn"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankName, row_number().over(w).cast("bigint"))
      .filter(col(rankName) <= k)
  }
}
