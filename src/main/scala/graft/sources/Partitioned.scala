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

  /** Write events partitioned by event date (idempotent per sfDir). */
  def setup(spark: SparkSession, sfDir: String): String = {
    val out = s"$root/events_${new java.io.File(sfDir).getName}"
    if (!new java.io.File(s"$out/_SUCCESS").exists ||
        !spark.conf.getOption("graft.partitioned.src").contains(out)) {
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      spark.conf.set("graft.partitioned.src", out)
    }
    out
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
