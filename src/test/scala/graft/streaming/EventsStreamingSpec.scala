package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import EventsStreaming._

/** Streaming specs: drive the file-stream source with the events fixture,
  * compare streaming results against the identical batch computation.
  */
class EventsStreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** events.parquet copied into a fresh dir (file stream sources read
    * directories; fixtures are read-only).
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(
      Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def batchEvents = normalize(
    spark.read.schema(rawSchema).parquet(streamDir))

  test("windowed aggregation: stream results equal batch results") {
    val q = hourlyAgg(readEvents(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .orderBy("hour_start", "event_type").collect()
      val batch = hourlyAgg(batchEvents)
        .orderBy("hour_start", "event_type").collect()
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSeq
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    mem.addData(rows)     // original delivery
    mem.addData(rows.take(100)) // duplicate re-delivery
    val deduped = dedupEvents(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == rows.length.toLong)
    } finally q.stop()
  }

  test("stream-static enrichment join") {
    import spark.implicits._
    val cats = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("signup", "growth"), ("error", "ops"))
      .toDF("event_type", "category")
    val q = enrich(readEvents(spark, streamDir), cats)
      .groupBy("category").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = enrich(batchEvents, cats).groupBy("category").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want && got.values.sum == batchEvents.count())
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join") {
    val q = attribution(readEvents(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .orderBy("p_id", "c_id").collect().map(_.toString).toSeq
      val batch = attribution(batchEvents)
        .orderBy("p_id", "c_id").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionization: streaming state machine matches batch window computation") {
    import spark.implicits._
    val ds = batchEvents
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]

    // batch oracle
    val batch = sessionizeBatch(ds, gapMin = 30)
      .select(col("user_id"), col("start"), col("end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "start").collect()

    // streaming: single micro-batch emits all but each user's last session
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ds.collect().toSeq)
    val q = sessionize(mem.toDS(), gapMin = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .orderBy("user_id", "start").collect()
      // every streamed (closed) session must appear identically in batch
      val batchSet = batch.map(_.toString).toSet
      assert(streamed.nonEmpty)
      assert(streamed.forall(r => batchSet.contains(r.toString)),
        s"streamed session missing from batch oracle")
      // and the only missing ones are the still-open tail sessions (≤1/user)
      val missing = batch.length - streamed.length
      val users = batch.map(_.getLong(0)).distinct.length
      assert(missing >= 0 && missing <= users)
    } finally q.stop()
  }
}
