package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned event storage: the partition-pruning path.
  *
  * At 100 TB the single biggest lever is never reading the data at
  * all: events laid out as `event_date=YYYY-MM-DD/` directories let a
  * day-filtered query plan a scan of ONE partition — the filter is
  * resolved against directory names before any file opens
  * (`PartitionFilters` + `PartitionCount: 1` in the plan, pinned by
  * PlanSpec). Time-series facts should always land partitioned by
  * their natural query grain; this module pays the one-time layout
  * write and the pruned query demonstrates the read side.
  */
object Partitioned {

  private def root = "/tmp/graft_partitioned"

  /** Write events partitioned by event date, plus a tiny calendar dim
    * (event_date, yr, wk) for join-driven pruning (idempotent per
    * sfDir). */
  def setup(spark: SparkSession, sfDir: String): String = {
    val out = s"$root/events_${new java.io.File(sfDir).getName}"
    if (!new java.io.File(s"$out/_SUCCESS").exists ||
        !spark.conf.getOption("graft.partitioned.src").contains(out)) {
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      spark.read.parquet(out).select(col("event_date")).distinct()
        .withColumn("yr", year(col("event_date")))
        .withColumn("wk", weekofyear(col("event_date")))
        .write.mode("overwrite").parquet(s"${out}_calendar")
      spark.conf.set("graft.partitioned.src", out)
    }
    out
  }

  /** DYNAMIC partition pruning: the days to read come from a FILTERED
    * calendar dimension at runtime — the literal predicate sits on the
    * tiny dim (latest ISO week), and Catalyst plants a
    * dynamicpruningexpression on the fact scan's partition column, so
    * only the dim-selected directories are opened even though the
    * query text never names a date. The join-driven analog of
    * [[lastDayCounts]]'s static pruning; PlanSpec pins the dynamic
    * filter. */
  def dppWeekCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val path = setup(spark, sfDir)
    val cal = spark.read.parquet(s"${path}_calendar")
    // bounded driver-side scalar off the day-count-sized dim: the
    // latest (yr, wk) pair becomes the dim's literal filter
    val last = cal.agg(max(struct(col("yr"), col("wk"))).as("m"))
      .select(col("m.yr"), col("m.wk")).head()
    val dim = cal.filter(col("yr") === last.getInt(0) && col("wk") === last.getInt(1))
    spark.read.parquet(path)
      .join(dim, "event_date")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** Per-type counts for the busiest single day, read through the
    * partitioned layout: the day filter prunes to ONE directory. */
  def lastDayCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val path = setup(spark, sfDir)
    // bounded driver-side scalar: the target day (max event_date) comes
    // from the partition LISTING, not a data scan
    val day = spark.read.parquet(path)
      .select(max(col("event_date"))).head().getDate(0)
    spark.read.parquet(path)
      .filter(col("event_date") === lit(day))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("event_date", lit(day))
      .orderBy("event_type")
  }
}
