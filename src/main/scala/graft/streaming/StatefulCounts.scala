package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`:
  * per-user running (event count, value sum) aggregator — the arbitrary-
  * state primitive the built-in windowed aggs can't express (e.g. custom
  * decay, per-key ML state).
  *
  * State is one small case class per user key, so state-store size is
  * O(distinct users), shuffle is keyed on user — the standard stateful
  * streaming scale shape.
  */
object StatefulCounts {

  case class UserState(nEvents: Long, sumValue: Double)
  case class UserRow(user_id: Long, n_events: Long, sum_value: Double)

  def updateState(userId: Long,
      rows: Iterator[(Long, Double)],
      state: GroupState[UserState]): UserRow = {
    val prev = state.getOption.getOrElse(UserState(0L, 0.0))
    var n = prev.nEvents
    var s = prev.sumValue
    // fold in deterministic (stable) order: sort batch rows by value key
    rows.toSeq.sortBy(_._1).foreach { case (_, v) => n += 1; s += v }
    val next = UserState(n, s)
    state.update(next)
    UserRow(userId, n, s)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-user totals maintained as custom state; with a bounded replay the
    // last update per user equals the batch aggregate.
    "q36_stream_stateful" -> ((s, d) => {
      import s.implicits._
      val path = s"$d/events.parquet"
      graft.Tables.nanosTs(s)
      val schema = s.read.parquet(path).schema
      s.catalog.dropTempView("sink_stateful")
      // glob so FileStreamSource uses the parent dir as basePath (it
      // ignores the basePath option for a plain file path)
      val src = s.readStream.schema(schema).parquet(s"$d/events.parq*")
        .select(col("user_id").cast("long"), col("event_id").cast("long"),
          col("value").cast("double"))
        .as[(Long, Long, Double)]
      val updated = src
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
          (k: Long, it: Iterator[(Long, Long, Double)], st: GroupState[UserState]) =>
            updateState(k, it.map(r => (r._2, r._3)), st))
      val q = updated.toDF()
        .writeStream.format("memory").queryName("sink_stateful")
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // keep only each user's final state (last update wins), rounded
      s.table("sink_stateful")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          round(max(col("sum_value")), 6).as("sum_value"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q36_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id"""
  )
}
