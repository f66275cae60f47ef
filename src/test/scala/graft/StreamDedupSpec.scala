package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming dropDuplicates keeps first arrival per key across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, user: Long, tpe: String, offsetSec: Int) =
      (id, new java.sql.Timestamp(base.getTime + offsetSec * 1000L), user, tpe, 1.0, "")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupStream(df)
      .writeStream.outputMode("append").format("memory").queryName("dedup_test")
      .start()
    try {
      input.addData(ev(1, 1, "click", 0), ev(2, 1, "click", 10), ev(3, 2, "click", 20))
      q.processAllAvailable()
      input.addData(ev(4, 1, "click", 30), ev(5, 1, "view", 40)) // 4 is a dup key
      q.processAllAvailable()
      val kept = spark.table("dedup_test").select("event_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"got $kept")
    } finally q.stop()
  }
}
