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

  def defs: Map[String, QueryDef] = Map(

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
