package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables.
  *
  * All loaders are plain `spark.read.parquet` scans so Catalyst can push
  * filters/projections into the parquet reader. The only normalization
  * done here is the `events.ts` nanosecond timestamp: Spark's parquet
  * reader rejects INT64 TIMESTAMP(NANOS) unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, so we read it as a long
  * and expose BOTH the raw nanos (`ts_ns`, exact — for gap/session
  * arithmetic) and a truncated-to-micros TimestampType `ts` (matches
  * DuckDB's `CAST(ts AS TIMESTAMP)`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** events with `ts_ns: Long` (exact nanos) and `ts: Timestamp` (micros). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
