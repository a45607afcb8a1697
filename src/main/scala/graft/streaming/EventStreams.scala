package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table.
  *
  * The batch loader ([[graft.sources.Tables.events]]) and this stream
  * share the same normalization (nanos → micros timestamp), so a
  * tumbling-window aggregation over the stream is batch-equivalent —
  * which is exactly what the `stream_windowed_agg` oracle checks.
  *
  * Scale design: file-source streaming reads incrementally
  * (maxFilesPerTrigger governs batch size on a real bucket), the
  * windowed aggregation is stateful with watermark-bounded state, and
  * `Trigger.AvailableNow` drains the backlog then stops — the pattern
  * for periodic large-scale backfill jobs.
  */
object EventStreams {

  /** Schema of the raw events parquet (ts read as raw nanos long via
    * spark.sql.legacy.parquet.nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // INT64 TIMESTAMP(NANOS) as raw long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Per-day tumbling-window counts/sums per event_type, computed by a
    * real streaming query (AvailableNow → memory sink), returned as a
    * batch DataFrame. Watermark bounds state so a continuous run would
    * not accumulate unbounded windows. */
  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // The file stream source wants a directory; point it at sfDir and
    // select just the events file with a glob filter.
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

    val sink = s"graft_stream_windowed_${runId.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sink)
      .select(col("w.start").as("period"), col("event_type"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("period", "event_type")
  }
}
