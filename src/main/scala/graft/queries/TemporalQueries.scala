package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.temporal.AsOfJoin

/** Temporal-join queries over the events table.
  *
  * The events `ts` column is nanosecond parquet (read as LONG ns); both
  * sides use the shared integer-µs axis (`ts div 1000` == DuckDB
  * `epoch_us(ts)`).
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // backward as-of join: each click picks up the most recent prior view
    // by the same user (inclusive), left-outer — the canonical "attach
    // last signal before the observation" shape. One keyed shuffle, no
    // range join.
    "q44_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          expr("ts div 1000").as("view_ts_us"))
      new AsOfJoin(Seq("user_id"), "ts_us", "view_ts_us").join(clicks, views)
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_ts_us
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT l.event_id, l.user_id, l.ts_us, r.view_id, r.view_ts_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.view_ts_us""".stripMargin
  )
}
