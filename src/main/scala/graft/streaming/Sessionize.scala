package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization over the events shape via
  * `flatMapGroupsWithState` — the custom-state streaming operator the
  * batch `q10_sessionize` query mirrors with lag+cumsum windows.
  *
  * State per user = (current session start, last event ts, event count).
  * An event more than `gapSeconds` after the last one closes the session
  * and emits it; event-time timeout flushes the final session when the
  * watermark passes last_ts + gap.
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(start: Long, lastTs: Long, nEvents: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  val GapMillis: Long = 1800L * 1000

  def updateState(useTimeout: Boolean)(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[Session] = {
    def toSession(s: SessionState) = Session(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs), s.nEvents)
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var cur = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastTs <= GapMillis =>
          cur = Some(s.copy(lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += toSession(s)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        if (useTimeout) state.setTimeoutTimestamp(s.lastTs + GapMillis)
      case None => ()
    }
    closed.result().iterator
  }

  /** Run the stateful sessionizer over the events parquet through the
    * streaming engine; returns closed sessions (in-memory sink). The final
    * (unflushed) session per user stays in state — exactly the streaming
    * semantic — so batch parity is asserted on CLOSED sessions.
    */
  /** `useTimeout=false` (default) emits EXACTLY the closed-by-successor
    * sessions — deterministic, so an SQL oracle can replicate it. With
    * event-time timeout, whether the final AvailableNow batch fires
    * pending timeouts is an engine scheduling detail; use it for real
    * continuous deployments, not for oracle-compared runs.
    */
  def run(spark0: SparkSession, eventsParquet: String,
          queryName: String, useTimeout: Boolean = false): DataFrame = {
    // local streaming-state sizing — see EventStream.streamSession
    val spark = EventStream.streamSession(spark0)
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsParquet).schema
    val parent = eventsParquet.substring(0, eventsParquet.lastIndexOf('/'))
    val fname = eventsParquet.substring(eventsParquet.lastIndexOf('/') + 1)
    val raw = spark.readStream.schema(schema)
      .option("basePath", parent).option("pathGlobFilter", fname).parquet(parent)
    val events = EventStream.convertTs(raw, schema)
      .select($"user_id", $"ts", $"event_id").as[Event]
      .withWatermark("ts", "10 minutes")
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(updateState(useTimeout))
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    EventStream.drainMemorySink(spark0, spark, q, queryName)
  }

  /** Batch twin on CLOSED sessions (a session is closed when a later event
    * of the same user starts a new one). */
  def closedSessionsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wrun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag("ts", 1).over(wl))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(wrun))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      // drop each user's LAST session (still open in the streaming view)
      .withColumn("_max", max("session_id").over(Window.partitionBy("user_id")))
      .filter(col("session_id") < col("_max"))
      .select("user_id", "session_start", "session_end", "n_events")
  }
}
