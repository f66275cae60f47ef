package graft

import graft.streaming.EventStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static enrichment: the streaming join against a batch dimension
  * must produce exactly the batch join's rows (same transform, two
  * bindings) and must not introduce streaming state (no watermark needed —
  * the static side is re-resolved per micro-batch). */
class StreamEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming enrichment equals the batch join on real data") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val dim = Tables.customer(spark, TestSpark.Sf0001)

    val q = EventStream.enriched(EventStream.readEvents(spark, srcDir), dim)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("enrich_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), if (r.isNullAt(4)) -1 else r.getInt(4))).toSet

    val batch = EventStream.enriched(Tables.events(spark, TestSpark.Sf0001), dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), if (r.isNullAt(4)) -1 else r.getInt(4))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // left-join convention: events with no dim row survive with NULLs
    assert(batch.size == Tables.events(spark, TestSpark.Sf0001).count())
  }
}
