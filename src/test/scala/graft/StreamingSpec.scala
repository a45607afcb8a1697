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

  test("stateful sessionize emits exactly the gap-closed batch sessions") {
    val streamed = graft.streaming.EventStreams.sessionize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // batch oracle: all sessions minus each user's last (still open) one
    val all = SparkEntry.queries("events_sessionize")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_us")))
    val closed = all.groupBy(_._1).values.flatMap(ss => ss.sortBy(_._2).dropRight(1)).toSet
    assert(streamed.toSet == closed, s"${streamed.length} streamed vs ${closed.size} closed")
  }

  test("streaming dedup collapses the doubled stream to original counts") {
    val deduped = graft.streaming.EventStreams.dedupedCounts(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count_distinct(col("event_id")).as("d"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(deduped.sameElements(batch))
  }

  test("stream-static enrichment is batch-equivalent") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStreams.enriched(spark, sf)
      .collect().map(_.toString)
    val users = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val batch = graft.sources.Tables.events(spark, sf)
      .join(users, Seq("user_id"), "left")
      .groupBy(col("event_type"), col("n_orders").isNotNull.cast("bigint").as("has_orders"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type", "has_orders")
      .collect().map(_.toString)
    assert(streamed.sameElements(batch))
  }

  test("watermarked stream-stream interval join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStreams.streamRangeJoin(spark, sf)
      .collect().map(_.toString)
    val batch = SparkEntry.queries("events_range_join")(spark, sf)
      .select(col("signup_id"), col("n_errors"))
      .orderBy("signup_id")
      .collect().map(_.toString)
    assert(streamed.sameElements(batch))
  }
}
