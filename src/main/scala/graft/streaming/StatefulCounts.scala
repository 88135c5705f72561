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

  /** Run `body` with the RocksDB state-store provider active, restoring
    * the session default afterwards. RocksDB is the state backend that
    * scales past executor heap (state spills to local SST files with
    * changelog checkpointing) — the provider any 100 TB streaming job
    * uses instead of the default in-memory HDFS-backed store. */
  private def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  val rocksDbQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The q33-shaped tumbling aggregation running on the RocksDB state
    // store — identical results, production state backend.
    "q65_stream_rocksdb" -> ((s, d) => {
      graft.Tables.nanosTs(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      s.catalog.dropTempView("sink_rocksdb")
      withRocksDb(s) {
        val src = s.readStream.schema(schema).parquet(s"$d/events.parq*")
          .withColumn("ts", graft.Tables.nanosToTs("ts"))
        val q = src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").queryName("sink_rocksdb")
          .outputMode(OutputMode.Complete())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table("sink_rocksdb")
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n_events"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // Spark 4's transformWithState — the successor to mapGroupsWithState:
    // typed per-key ValueState through a StatefulProcessor handle, timers,
    // TTL, multiple state variables. Requires the RocksDB provider. Same
    // per-user aggregate as q36, expressed through the new API.
    "q66_transform_with_state" -> ((s, d) => {
      import s.implicits._
      graft.Tables.nanosTs(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      s.catalog.dropTempView("sink_tws")
      withRocksDb(s) {
        val src = s.readStream.schema(schema).parquet(s"$d/events.parq*")
          .select(col("user_id").cast("long"), col("event_id").cast("long"),
            col("value").cast("double"))
          .as[(Long, Long, Double)]
        val updated = src
          .groupByKey(_._1)
          .transformWithState(new CountProcessor(),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update())
        val q = updated.toDF()
          .writeStream.format("memory").queryName("sink_tws")
          .outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table("sink_tws")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          round(max(col("sum_value")), 6).as("sum_value"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q36_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q65_stream_rocksdb" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
         event_type, count(*) AS n_events
         FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q66_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id"""
  )
}

/** transformWithState processor: per-user running (count, sum) in a typed
  * ValueState — the new-API twin of [[StatefulCounts.updateState]]. */
class CountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, Double), StatefulCounts.UserRow] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}

  @transient private var state: ValueState[StatefulCounts.UserState] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[StatefulCounts.UserState](
      "userTotals", org.apache.spark.sql.Encoders.product[StatefulCounts.UserState],
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[StatefulCounts.UserRow] = {
    val prev = if (state.exists()) state.get() else StatefulCounts.UserState(0L, 0.0)
    var n = prev.nEvents
    var sum = prev.sumValue
    // deterministic fold order (stable event_id sort), as in q36
    rows.toSeq.sortBy(_._2).foreach { r => n += 1; sum += r._3 }
    state.update(StatefulCounts.UserState(n, sum))
    Iterator.single(StatefulCounts.UserRow(key, n, sum))
  }
}
