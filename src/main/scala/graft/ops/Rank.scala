package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order rank WITHOUT the single-partition window — the
  * same two-level decomposition as [[Pack.sequencePack]], applied to a
  * value ordering instead of a stable-id ordering.
  *
  * `Window.orderBy(...)` with no partition key plans as a one-task sort
  * of the whole table — the classic scale cliff. Instead:
  *
  *   1. rows block by coarse VALUE range (`value div blockWidth`); the
  *      rank window runs WITHIN each block, partitioned across the
  *      cluster;
  *   2. per-block row counts (one tiny row per block) prefix-sum in
  *      block-descending order, giving each block's starting offset;
  *   3. global rank = block offset + within-block rank.
  *
  * Identical by construction to `row_number() OVER (ORDER BY value
  * DESC, tie ASC)` — which is exactly how the DuckDB oracle computes
  * it. Block sizes follow the VALUE distribution, so a pathological
  * spike collapses into one block; production would swap the fixed
  * `blockWidth` for `repartitionByRange` sample bounds, but the offset
  * algebra is unchanged.
  *
  * The input is referenced TWICE (block offsets + the ranked side), so
  * callers ranking an EXPENSIVE derived table should localCheckpoint
  * it first (m_gini/m_rfm do); for a raw source scan the double read
  * is cheaper than materializing it.
  */
object Rank {

  /** Appends bigint `rnk` = position under (valueCol DESC, tieCol ASC).
    * Works for any numeric valueCol (blocks come from floor division). */
  def globalRank(df: DataFrame, valueCol: String, tieCol: String,
                 blockWidth: Double = 64.0): DataFrame = {
    require(!df.columns.contains("__blk"), "__blk is reserved by globalRank")
    val t = df.withColumn("__blk",
      floor(col(valueCol) / lit(blockWidth)).cast("long"))
    val wIn = Window.partitionBy("__blk")
      .orderBy(col(valueCol).desc, col(tieCol).asc)
    // one row per block — the only unpartitioned window runs over this
    // bounded table, never the raw rows
    val wBlk = Window.orderBy(col("__blk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("__blk").agg(count(lit(1)).as("blk_n"))
      .withColumn("blk_off", coalesce(sum("blk_n").over(wBlk), lit(0L)))
      .select("__blk", "blk_off")
    t.withColumn("rnk_in", row_number().over(wIn).cast("bigint"))
      .join(broadcast(offsets), "__blk")
      .withColumn("rnk", col("blk_off") + col("rnk_in"))
      .drop("__blk", "rnk_in", "blk_off")
  }
}
