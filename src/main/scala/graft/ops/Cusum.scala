package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUSUM change detection (Page 1954) over per-key daily count series
  * — the shared fold behind events_cusum (batch) and stream_cusum
  * (incremental maintenance of the daily state): S_t = max(0, S_{t−1}
  * + x_t − μ₀ − κ) with μ₀ = integer mean of the first 28 observed
  * days, κ = μ₀/20, alarm threshold h = μ₀, everything quantized to
  * ×10⁶ BIGINT floor-division arithmetic so the sequential statistic
  * has no float surface.
  *
  * The recurrence folds inside ONE `aggregate` higher-order expression
  * per calendar-bounded series (the series is a bounded array — days,
  * not corpus rows); the caller owns the only corpus-sized pass (the
  * daily groupBy), which is also what makes the streaming variant
  * honest: daily counts are MERGEABLE state, the sequential statistic
  * is derived from that bounded state at read time. */
object Cusum {

  /** daily: (event_type, dt, y) → per-(event_type, dt) rows with the
    * statistic and alarm flag, ordered by (event_type, dt). */
  def fromDaily(daily: DataFrame): DataFrame = daily
    .groupBy("event_type")
    .agg(sort_array(collect_list(struct(col("dt"), col("y")))).as("arr"))
    .withColumn("mu_u6", expr(
      "aggregate(slice(arr, 1, 28), CAST(0 AS BIGINT), (a, e) -> a + e.y)" +
        " * 1000000 div least(size(arr), 28)"))
    .withColumn("k_u6", expr("mu_u6 div 20"))
    .select(col("event_type"), col("mu_u6"), expr(
      """aggregate(
        |  slice(arr, 2, size(arr) - 1),
        |  array(named_struct(
        |    'dt', element_at(arr, 1).dt, 'y', element_at(arr, 1).y,
        |    's', greatest(CAST(0 AS BIGINT),
        |      element_at(arr, 1).y * 1000000 - mu_u6 - k_u6))),
        |  (acc, e) -> concat(acc, array(named_struct(
        |    'dt', e.dt, 'y', e.y,
        |    's', greatest(CAST(0 AS BIGINT),
        |      element_at(acc, -1).s + e.y * 1000000 - mu_u6 - k_u6)))))""".stripMargin)
      .as("st"))
    .select(col("event_type"), col("mu_u6"), explode(col("st")).as("h"))
    .select(col("event_type"), col("h.dt").as("dt"), col("h.y").as("y"),
      col("h.s").as("cusum_u6"),
      (col("h.s") > col("mu_u6")).cast("long").as("alarm"))
    .orderBy("event_type", "dt")
}
