package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed agg is batch-equivalent") {
    val streamed = graft.streaming.EventStreams.windowedAgg(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("period"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("period", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }
}
