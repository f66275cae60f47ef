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
