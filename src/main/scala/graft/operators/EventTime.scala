package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time processing: tumbling-window aggregation over the events table.
  * [[hourlyAgg]] is a pure DataFrame→DataFrame transform shared verbatim by
  * the batch query below and the Structured Streaming pipeline
  * (`graft.streaming.EventStream`) — write the logic once, run it in either
  * mode.
  */
object EventTime {

  /** Tumbling 1-hour window per event_type: count + exact decimal sum.
    * Emits the window start as epoch seconds (a portable integer instead of
    * an engine-specific timestamp encoding).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dec2(sum(dec(col("value")))).as("total_value"))
      .select(
        col("window.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n_events"), col("total_value"))

  def hourly(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(Tables.events(spark, dir))

  val hourlySql: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
      |         AS window_start_epoch,
      |       event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start_epoch, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("events_hourly", hourly(_, _).orderBy("window_start_epoch", "event_type"),
      Some(hourlySql)))
}
