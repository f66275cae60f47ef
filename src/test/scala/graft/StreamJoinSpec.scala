package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-stream interval join attributes purchases within the hour") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, user: Long, tpe: String, offsetMin: Int) =
      (id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L), user, tpe, 1.0, "")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.attribution(df)
      .writeStream.outputMode("append").format("memory").queryName("attr_test")
      .start()
    try {
      input.addData(
        ev(1, 1, "click", 0),
        ev(2, 1, "purchase", 10),  // within 1h of click 1 → attributed
        ev(3, 1, "purchase", 90),  // 90min after click 1 → NOT attributed
        ev(4, 2, "purchase", 5))   // other user → NOT attributed
      q.processAllAvailable()
      val got = spark.table("attr_test")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("streaming attribution equals the batch interval join on real data") {
    val batch = graft.operators.EventTime.attribution(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    // same transform bound to a stream over the same rows
    val srcDir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    Tables.events(spark, TestSpark.Sf0001).write.parquet(s"$srcDir/events")
    val stream = EventStream.attribution(
      spark.readStream.schema(Tables.events(spark, TestSpark.Sf0001).schema)
        .parquet(s"$srcDir/events"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("attr_full").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_full")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
