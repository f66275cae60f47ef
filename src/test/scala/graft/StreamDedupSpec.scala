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

  test("streaming dedup over the real events equals its batch twin") {
    // PARITY GATE (same standard as StreamBatchParitySpec): the streaming
    // face must agree with the batch face on the SAME testdata parquet.
    // Exact dedup's deterministic contract is one representative per key
    // with full key coverage; WHICH representative survives is arbitrary in
    // BOTH faces (batch dropDuplicates and streaming state both keep the
    // first row processed), so the gate asserts key-set equality,
    // cardinality, and that every surviving row IS a row of the batch
    // relation — not representative identity, which neither face defines.
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val src = java.nio.file.Files.createTempDirectory("graft-parity-dedup")
    val all = Tables.events(spark, TestSpark.Sf0001)
    all.select(col("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("ts", expr("ts * 1000"))
      .write.mode("overwrite").parquet(src.toString)
    val q = EventStream.dedupStream(EventStream.readEvents(spark, src.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup_parity")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("dedup_parity").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet

    val batchKeys = all.select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchRows = all.select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    assert(streamed.map(t => (t._2, t._3)) == batchKeys, "key coverage diverges")
    assert(streamed.size == batchKeys.size, "must keep exactly one row per key")
    streamed.foreach(t => assert(batchRows.contains(t), s"foreign row $t"))
  }

  test("bounded dedup suppresses within the horizon and re-admits after eviction") {
    // The two halves of dropDuplicatesWithinWatermark's contract, pinned:
    //  (a) a duplicate arriving within the 2 h delay of its key's first
    //      occurrence is dropped;
    //  (b) once the watermark passes a key's eviction point, the SAME key
    //      is re-admitted — bounded state trades exactness for O(horizon)
    //      memory, and this spec is the record of that trade (if a Spark
    //      upgrade silently changed eviction semantics, (b) fails).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, user: Long, tpe: String, offsetMin: Int) =
      (id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L), user, tpe, 1.0, "")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupStreamBounded(df)
      .writeStream.outputMode("append").format("memory").queryName("dedup_bounded")
      .start()
    try {
      // (a) key (1, click) first at t+0, dup at t+30min — inside the horizon
      input.addData(ev(1, 1, "click", 0), ev(2, 2, "click", 0))
      q.processAllAvailable()
      input.addData(ev(3, 1, "click", 30))
      q.processAllAvailable()
      // advance the watermark far past the eviction point (t0 + 2 h):
      // watermark = max event time − 2 h, committed at batch END, so one
      // more batch after the advancing event makes eviction effective
      input.addData(ev(4, 3, "click", 600)) // t+10 h → watermark t+8 h
      q.processAllAvailable()
      input.addData(ev(5, 3, "view", 601)) // flush batch: commit watermark
      q.processAllAvailable()
      // (b) key (1, click) again at t+10h02 — state was evicted → re-admit
      input.addData(ev(6, 1, "click", 602))
      q.processAllAvailable()
      val kept = spark.table("dedup_bounded").select("event_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept.contains(1L) && !kept.contains(3L),
        s"within-horizon duplicate must be suppressed: $kept")
      assert(kept.contains(6L),
        s"post-eviction arrival of an old key must be re-admitted: $kept")
      assert(kept == Set(1L, 2L, 4L, 5L, 6L), s"got $kept")
    } finally q.stop()
  }
}
