package graft

import graft.streaming.StreamingQueries
import org.apache.spark.sql.functions._

/** Structured Streaming results must equal their batch equivalents over
  * the bounded events fixture (complete mode + AvailableNow = exact batch
  * answer).
  */
class StreamingSpec extends TestSpark {

  test("tumbling stream windows == batch date_trunc aggregation") {
    val streamed = StreamingQueries.queries("q33_stream_tumbling")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("sliding windows double-count every event") {
    val total = StreamingQueries.queries("q34_stream_sliding")(spark, sf0001)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val nEvents = Tables.events(spark, sf0001).count()
    assert(total == 2 * nEvents)
  }

  test("session windows partition each user's events") {
    val sessions = StreamingQueries.queries("q35_stream_session")(spark, sf0001)
    val perUser = sessions.groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf0001).groupBy(col("user_id"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == batch, "session event counts must partition per-user events")
  }
}
