package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, expr, unix_micros}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Sixth streaming path: heavy hitters. The parity standard matches the
  * other five (hourly agg, sessionization, funnel, dedup, enrichment) —
  * the streaming face must agree with the batch face on the same testdata.
  */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, tpe: String) = (id, base, 1L, tpe, 1.0, "")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.heavyHitters(df)
      .writeStream.outputMode("complete").format("memory").queryName("hh_inc")
      .start()
    try {
      input.addData(ev(1, "click"), ev(2, "click"), ev(3, "view"))
      q.processAllAvailable()
      input.addData(ev(4, "click"), ev(5, "buy"))
      q.processAllAvailable()
      val got = spark.table("hh_inc")
        .select(explode(col("hh")).as("h"))
        .select(col("h.key"), col("h.count")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // complete mode re-emits the merged state: both batches' rows counted
      assert(got == Map("click" -> 3L, "view" -> 1L, "buy" -> 1L), got.toString)
    } finally q.stop()
  }

  test("streaming heavy hitters over the real events equals the batch sketch") {
    val src = java.nio.file.Files.createTempDirectory("graft-parity-hh")
    val all = Tables.events(spark, TestSpark.Sf0001)
    all.select(col("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("ts", expr("ts * 1000"))
      .write.mode("overwrite").parquet(src.toString)
    val q = EventStream.heavyHitters(EventStream.readEvents(spark, src.toString))
      .writeStream.outputMode("complete").format("memory").queryName("hh_parity")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("hh_parity")
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // k = 16 exceeds the distinct event-type count, so the sketch is EXACT
    // (err = 0) and both faces must equal the true groupBy counts — the
    // same contract the batch operator's oracle asserts
    val exact = all.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.map(_._1).toSet == exact.keySet)
    streamed.foreach { case (key, count, err) =>
      assert(err == 0L, s"$key err=$err")
      assert(count == exact(key), s"$key: streamed $count vs exact ${exact(key)}")
    }

    val batch = operators.Relational.heavyHitters(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.toSet == batch)
  }
}
