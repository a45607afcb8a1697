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
  *
  * The nanosAsLong conf itself is set once at session build (see
  * [[Sessions.tune]], used by Verify / Bench / the test session) — a
  * loader must not mutate session-wide state as a side effect.
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

  /** events with `ts_ns: Long` (exact nanos) and `ts: Timestamp` (micros).
    *
    * Schema-adaptive: the driver's earlier testdata wrote `ts` as INT64
    * TIMESTAMP(NANOS) (read as a raw long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions.tune]]);
    * the current testdata writes plain `timestamp[us]` (no timezone →
    * TIMESTAMP_NTZ in Spark). Both normalize to the same two columns —
    * the NTZ wall-clock is interpreted in the session's UTC zone, so
    * `ts_us = unix_micros(ts)` equals DuckDB's `epoch_us(ts)` on the
    * same file, which is what every oracle compares against. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy INT64 nanos
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // timestamp[us] (NTZ); exact micros → nanos
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
}

/** Session-level configuration shared by Verify, Bench and tests. */
object Sessions {
  /** Confs every graft session needs; applied at build time so no query
    * or loader ever mutates a live session. */
  val required: Map[String, String] = Map(
    // custom functions + the scalar-cross-join rewrite rule, applied
    // at build time (the extension cannot attach to a live session)
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    // events.parquet carries INT64 TIMESTAMP(NANOS); read as raw long
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone"           -> "UTC",
    // AQE re-plans at runtime: coalesces tiny shuffle partitions locally,
    // splits skewed ones on a real cluster
    "spark.sql.adaptive.enabled"           -> "true",
    // Streaming checkpoints here are EPHEMERAL replay scratch (temp
    // dirs, deleted on exit): the Spark 4 checksum layer — which
    // exists to catch silent corruption on long-lived remote
    // checkpoint storage — doubles the file count and fsyncs of every
    // state commit, and profiled as ~2.3× of streaming wall time at
    // sf0.1 (Profile "streams": range join 24.3 s → 10.7 s from this
    // conf alone). A durable production checkpoint on object storage
    // should keep it enabled.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
    // managed-table location for the bucketed-join path ([[Bucketed]]);
    // set at build time because the catalog pins it at first use
    "spark.sql.warehouse.dir"              -> "/tmp/graft_warehouse",
  )

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    required.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
