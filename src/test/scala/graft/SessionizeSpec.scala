package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private val Min = 60L * 1000 * 1000 // µs
  private val Base = 1000L * Min // keep fixtures clear of the epoch-0 watermark boundary
  private def t(us: Long): java.sql.Timestamp = new java.sql.Timestamp((Base + us) / 1000L)

  test("batch sessionization splits on the 30-minute gap") {
    import spark.implicits._
    val events = Seq(
      Event(1L, t(0L), 1.0), Event(1L, t(10 * Min), 2.0),      // session A
      Event(1L, t(60 * Min), 4.0),                             // session B (50min gap)
      Event(2L, t(5 * Min), 8.0)).toDS()
    val out = Sessionize.sessionsBatch(events).collect().sortBy(s => (s.user_id, s.start_us))
    assert(out.toSeq == Seq(
      Session(1L, Base, Base + 10 * Min, 2, 3.0),
      Session(1L, Base + 60 * Min, Base + 60 * Min, 1, 4.0),
      Session(2L, Base + 5 * Min, Base + 5 * Min, 1, 8.0)))
  }

  test("SQL-window sessions equal the typed fold sessions on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // declared query: lag + cumulative-sum windows (graft.operators.EventTime)
    val sql = graft.operators.EventTime.sessions(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(3) + r.getLong(4), r.getLong(2)) ->
        r.getDouble(5))
    // typed fold (the streaming sessionizer's batch face)
    val typed = Sessionize.sessionsBatch(
      Tables.events(spark, TestSpark.Sf0001)
        .select(col("user_id"), col("ts"), col("value")).as[Event])
      .collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events) -> s.total_value)
    assert(sql.map(_._1).toSet == typed.map(_._1).toSet,
      "session boundaries/counts must agree between formulations")
    val typedByKey = typed.toMap
    sql.foreach { case (k, v) =>
      // decimal-exact vs double-fold sums agree to rounding
      assert(math.abs(typedByKey(k) - v) < 1e-6, s"session value mismatch at $k")
    }
  }

  test("streaming flatMapGroupsWithState emits closed sessions as batches arrive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sessions_test")
      .start()
    try {
      input.addData(Event(1L, t(0L), 1.0), Event(1L, t(10 * Min), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0, "session still open")
      input.addData(Event(1L, t(60 * Min), 4.0)) // gap > 30min closes session A
      q.processAllAvailable()
      val closed = spark.table("sessions_test").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1L, Base, Base + 10 * Min, 2, 3.0)))
    } finally q.stop()
  }
}
