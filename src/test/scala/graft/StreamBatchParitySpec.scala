package graft

import graft.operators.EventTime
import graft.streaming.{EventStream, FunnelStream, Sessionize}
import graft.streaming.FunnelStream.Ev
import graft.streaming.Sessionize.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** STREAMING ↔ BATCH PARITY GATE: the streaming tier's outputs must equal
  * their oracle-green batch twins on the SAME testdata parquet — the
  * correctness standard every other tier is held to, extended to the one
  * tier DuckDB cannot replay. The shared-transform design (one DataFrame
  * transform bound to `read` or `readStream`; one pure fold under both
  * `flatMapGroups` and `flatMapGroupsWithState`) is what makes these three
  * assertions small: any drift between the faces is a bug, not a tolerance.
  *
  * The stateful streams are flushed by SENTINEL events for a reserved
  * user (-1) far past the real data: the first sentinel batch advances the
  * event-time watermark beyond every real session/funnel horizon, the
  * second triggers the batch in which those timeouts fire (watermarks
  * propagate at batch boundaries, timeouts fire in the following batch).
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  test("streaming hourly aggregation equals the oracle-green events_hourly") {
    // the file stream source wants a DIRECTORY; stage the events table into
    // one (the staged files carry micros ts, so the stream applies the
    // nanos conversion to an already-converted column — a no-op shift of 0)
    val src = java.nio.file.Files.createTempDirectory("graft-parity-hourly")
    val all = Tables.events(spark, TestSpark.Sf0001)
    all.select(col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts * 1000"))
      .write.mode("overwrite").parquet(src.toString)
    val streamed = EventStream
      .runToCompletion(spark, src.toString, "parity_hourly")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventTime.hourly(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch,
      s"hourly windows diverge: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("streaming sessionization equals the oracle-green events_sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val real = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("value")).as[Event].collect()
    val maxUs = real.map(_.ts_us).max
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("parity_sessions").start()
    try {
      input.addData(real.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(Event(-1L, tsOf(maxUs + 30L * 86400000000L), 0.0))
      q.processAllAvailable()
      input.addData(Event(-1L, tsOf(maxUs + 31L * 86400000000L), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_sessions").as[Session].collect()
      .filter(_.user_id >= 0)
      .map(s => (s.user_id, s.start_us, s.end_us - s.start_us, s.n_events) -> s.total_value)
    // the declared query: (user_id, session_idx, n_events, start_us,
    // duration_us, session_value) — session identity is (user, start, dur, n)
    val batch = EventTime.sessions(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)) -> r.getDouble(5))
    assert(streamed.map(_._1).toSet == batch.map(_._1).toSet,
      "session boundaries must agree between streaming and batch")
    assert(streamed.length == batch.length, "duplicate session emission")
    val byKey = streamed.toMap
    batch.foreach { case (k, v) =>
      // double fold vs exact-decimal sum: equal to float rounding
      assert(math.abs(byKey(k) - v) < 1e-6, s"session value mismatch at $k")
    }
  }

  test("streaming funnel equals the oracle-green events_funnel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val real = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("event_type")).as[Ev].collect()
    val maxUs = real.map(_.ts_us).max
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnel(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("parity_funnel").start()
    try {
      input.addData(real.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(Ev(-1L, tsOf(maxUs + 30L * 86400000000L), "view"))
      q.processAllAvailable()
      input.addData(Ev(-1L, tsOf(maxUs + 31L * 86400000000L), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_funnel").as[FunnelStream.FunnelRow].collect()
      .filter(_.user_id >= 0)
      .map(f => (f.user_id, f.view_us, f.click_us.getOrElse(-1L),
        f.purchase_us.getOrElse(-1L), f.stage))
      .toSet
    val batch = EventTime.funnel(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))
      .toSet
    assert(streamed == batch,
      s"funnel rows diverge: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
