package graft

import graft.operators.EventTime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** WATERMARK LATE-DATA semantics, pinned: the batch-side
  * `events_lateness_profile` recommends a watermark delay; this spec drives
  * the hourly aggregation as a STREAM with that delay and asserts exactly
  * which events the watermark drops — the too-late event (its window closed
  * before the watermark) vanishes, the merely-out-of-order event (window
  * still open) lands. The cross-check replays the watermark trajectory
  * batch-side: watermark after batch i = max event time seen through batch
  * i minus the delay, an event survives iff its WINDOW END outlives the
  * watermark in force when it arrives — stream result must equal the
  * batch aggregate over exactly the surviving events. (Update mode: in
  * complete mode no state is evicted and nothing is ever dropped.)
  */
class StreamLatenessSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private case class E(ts: java.sql.Timestamp, event_type: String, value: Double)

  private def tsAt(min: Long): java.sql.Timestamp =
    new java.sql.Timestamp(min * 60L * 1000L) // minutes since epoch, UTC

  test("1h watermark drops the closed-window straggler, keeps the open one") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[E]
    val q = EventTime.hourlyAgg(input.toDF().withWatermark("ts", "1 hour"))
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("lateness_stream")
      .start()
    try {
      // batch 1: hour-0 and hour-2 events; max event time 2:30
      val batch1 = Seq(
        E(tsAt(20), "click", 1.0), // hour 0
        E(tsAt(80), "click", 1.0), // hour 1
        E(tsAt(150), "click", 1.0)) // hour 2, advances watermark to 1:30
      input.addData(batch1: _*)
      q.processAllAvailable()
      // batch 2, against watermark 1:30:
      //  - 0:10 -> window [0:00,1:00) already closed => DROPPED
      //  - 1:45 -> window [1:00,2:00) still open     => accepted
      //  - 2:40 -> on time                            => accepted
      val batch2 = Seq(
        E(tsAt(10), "click", 100.0),
        E(tsAt(105), "click", 1.0),
        E(tsAt(160), "click", 1.0))
      input.addData(batch2: _*)
      q.processAllAvailable()

      // latest update per window is the stream's final answer
      val got = spark.table("lateness_stream")
        .collect()
        .groupBy(_.getAs[Long]("window_start_epoch"))
        .map { case (w, rs) => w -> rs.last.getAs[Long]("n_events") }

      // batch replay of the watermark trajectory
      val delayMin = 60L
      val wmAfter1 = batch1.map(_.ts.getTime / 60000L).max - delayMin
      def winStart(e: E): Long = (e.ts.getTime / 3600000L) * 3600L
      def winEndMin(e: E): Long = ((e.ts.getTime / 3600000L) + 1) * 60L
      val survivors = batch1 ++ batch2.filter(e => winEndMin(e) > wmAfter1)
      val want = survivors.groupBy(winStart).map { case (w, es) => w -> es.size.toLong }

      assert(got === want, s"stream $got vs batch-replayed $want")
      // and the specific laws, spelled out:
      assert(got(0L) === 1L, "the closed-window straggler must be dropped")
      assert(got(3600L) === 2L, "the open-window straggler must be counted")
      assert(!survivors.exists(_.value == 100.0))
    } finally q.stop()
  }
}
