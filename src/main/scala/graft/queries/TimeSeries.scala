package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.events
import graft.operators.AsOf

/** Time-series operators over the events table. The as-of join
  * implementation (graft.operators.AsOf) is oracled against DuckDB's
  * NATIVE `ASOF JOIN` — two completely independent implementations that
  * must agree row-for-row.
  */
object TimeSeries {

  def defs: Map[String, QueryDef] = QueryDef.gate(

    // One-row probe over the sessionize timestamp channel: global
    // count/min/max/sum of ts_ms, all integers. If ANY event's ms
    // derivation disagrees between the engines, the sum cell flips and
    // this query pins the diverging engine+column in a single driver run.
    "q_ts_probe" -> QueryDef(
      (s, d) => events(s, d)
        .select(expr("unix_micros(ts) div 1000").as("ts_ms"))
        .agg(count(lit(1)).as("n_events"),
          min("ts_ms").cast("long").as("ts_ms_min"),
          max("ts_ms").cast("long").as("ts_ms_max"),
          sum("ts_ms").cast("long").as("ts_ms_sum")),
      Some("""SELECT cast(count(*) AS bigint) AS n_events,
             |  cast(min(ts_ms) AS bigint) AS ts_ms_min,
             |  cast(max(ts_ms) AS bigint) AS ts_ms_max,
             |  cast(sum(ts_ms) AS bigint) AS ts_ms_sum
             |FROM (SELECT epoch_ns(ts) // 1000000 AS ts_ms FROM events) e""".stripMargin)),

    // Gap-based sessionization (batch form of
    // graft.streaming.EventsStreaming.sessionize): 30-min inactivity gap,
    // one window shuffle on user_id. Session boundaries compare at
    // MILLISECOND resolution on both engines: the source column is parquet
    // timestamp[ns], and the two engines may truncate vs round a ns→µs
    // cast differently, so any µs-resolution comparison is one
    // representation quirk away from flipping a boundary. Both sides now
    // derive ts_ms by PURE FLOOR from the source integers — Spark:
    // ns `div` 1000 at load (Tables.events) then unix_micros div 1000;
    // oracle: epoch_ns(ts) // 1000000, never casting timestamp_ns down —
    // so no engine-dependent rounding channel remains anywhere.
    // All outputs are integers (value sum as exact decimal cents) so the
    // cross-engine hash has no float channel at all.
    //
    // Rounds 1-4 this was the one hash-red gate cell; a local row-by-row
    // diff (round 5) showed every VALUE identical and pinned the real
    // channel: DuckDB's windowed sum() returns HUGEINT, which pandas
    // narrows to float64, so the oracle's session_id column hashed as
    // 1.0/2.0/… against Spark's int64 1/2/…. Hence the explicit
    // cast(session_id AS bigint) in the oracle's outer SELECT — every
    // aggregate-derived output column must be cast to a concrete width
    // in BOTH engines, group keys included.
    "q_sessionize" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_ms", "event_id")
        events(s, d)
          .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
          .withColumn("prev_ms", lag("ts_ms", 1).over(w))
          .withColumn("new_session",
            when(col("prev_ms").isNull ||
              (col("ts_ms") - col("prev_ms")) > 30L * 60000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum("new_session").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          // sum as decimal: double summation is sensitive to partition
          // accumulation order, which can flip round() at the boundary
          // between runs; decimal summation is exact and order-independent.
          // Emitted as integer cents — no double anywhere in the output.
          .agg(count(lit(1)).as("n_events"),
            (round(sum(col("value").cast("decimal(18,6)")), 2) * 100)
              .cast("long").as("total_cents"),
            expr("(max(ts_ms) - min(ts_ms)) div 1000").cast("long")
              .as("duration_sec"))
          .orderBy("user_id", "session_id")
      },
      Some("""SELECT user_id, cast(session_id AS bigint) AS session_id, cast(count(*) AS bigint) AS n_events,
             |  cast(round(sum(cast("value" AS DECIMAL(18,6))), 2) * 100 AS bigint) AS total_cents,
             |  cast((max(ts_ms) - min(ts_ms)) // 1000 AS bigint) AS duration_sec
             |FROM (
             |  SELECT user_id, ts_ms, "value", event_id,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM (
             |    SELECT user_id, ts_ms, "value", event_id,
             |      CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
             |             OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) > 1800000
             |           THEN 1 ELSE 0 END AS new_session
             |    FROM (SELECT user_id, "value", event_id,
             |            epoch_ns(ts) // 1000000 AS ts_ms
             |          FROM events) e) x) y
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Exact interpolated quantiles + distribution moments per event type.
    // percentile() in Spark and quantile_cont() in DuckDB are both exact
    // linear interpolation (NOT the approx sketches, which would never
    // cross-match). Moments are computed from EXACT decimal power sums
    // (sum x, sum x²) rather than the engines' streaming variance
    // aggregates: decimal sums are order-independent, so both engines
    // derive the variance from bit-identical doubles — no accumulation-
    // order flap at the rounding boundary.
    "q_quantiles" -> QueryDef(
      (s, d) => events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("s1"),
          sum((col("value") * col("value")).cast("decimal(28,10)")).cast("double").as("s2"),
          count(lit(1)).as("n"),
          round(min("value"), 2).as("vmin"),
          round(max("value"), 2).as("vmax"))
        .select(col("event_type"), col("p50"), col("p90"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4).as("sd"),
          round((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 4).as("variance"),
          col("vmin"), col("vmax"))
        .orderBy("event_type"),
      Some("""WITH m AS (
             |  SELECT event_type,
             |    round(quantile_cont("value", 0.5), 4) AS p50,
             |    round(quantile_cont("value", 0.9), 4) AS p90,
             |    cast(sum(cast("value" AS DECIMAL(18,6))) AS double) AS s1,
             |    cast(sum(cast("value" * "value" AS DECIMAL(28,10))) AS double) AS s2,
             |    count(*) AS n,
             |    round(min("value"), 2) AS vmin,
             |    round(max("value"), 2) AS vmax
             |  FROM events GROUP BY event_type)
             |SELECT event_type, p50, p90,
             |  round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS sd,
             |  round((s2 - s1 * s1 / n) / (n - 1), 4) AS variance,
             |  vmin, vmax
             |FROM m ORDER BY event_type""".stripMargin)),

    // Attribution: each purchase joined to the user's most recent prior
    // (or simultaneous) click.
    "q_asof_join" -> QueryDef(
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("value").as("click_value"))
        AsOf.asofJoin(purchases, clicks,
            by = "user_id", leftTime = "ts", rightTime = "ts",
            payload = Seq("click_id", "click_value"))
          .select(
            col("event_id"), col("user_id"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"),
            coalesce(col("click_value"), lit(-1.0)).as("click_value"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
             |  coalesce(c.click_id, -1) AS click_id,
             |  coalesce(c.click_value, -1.0) AS click_value
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id, "value" AS click_value
             |                FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin))
  )
}
