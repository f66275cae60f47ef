package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regression pins.
  *
  * The driver regenerated `/root/testdata` between rounds 6 and 7 and the
  * events parquet changed physical ts encoding (TIMESTAMP-NANOS →
  * TIMESTAMP-MICROS ntz). The old reader assumed nanos, silently divided
  * every timestamp by 1000, and all 24 event-time/window queries went red
  * for two rounds while the unit suite stayed green — because no test read
  * the REAL driver data's time axis. These pins make the unit suite the
  * early-warning system for the next regeneration.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver events data lands in its documented 2024 span after normalization") {
    val r = Tables.events(spark, TestSpark.Sf0001)
      .agg(
        year(min(col("ts"))).as("ymin"),
        year(max(col("ts"))).as("ymax"),
        count(lit(1)).as("n"),
        countDistinct(date_trunc("hour", col("ts"))).as("hours"))
      .head()
    assert(r.getInt(0) === 2024, "min(ts) year — a 1000x-off decode lands in 1970")
    assert(r.getInt(1) === 2024, "max(ts) year")
    assert(r.getLong(2) > 0)
    // a collapsed time axis (the round-7/8 failure mode) yields single-digit
    // distinct hours; the real data spans weeks
    assert(r.getLong(3) > 100, s"distinct event hours = ${r.getLong(3)}")
  }

  test("events read schema adapts to the footer's physical ts type") {
    def tsType(schema: StructType) = schema("ts").dataType

    // whatever the driver currently ships must probe to a type the
    // normalizer handles, and normalize to micros TimestampType
    val probed = tsType(Tables.eventsReadSchema(spark,
      s"${TestSpark.Sf0001}/events.parquet"))
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(probed))
    assert(tsType(Tables.events(spark, TestSpark.Sf0001).schema) === TimestampType)

    // the legacy nanos-long form (still produced by GenData and by older
    // driver snapshots) normalizes to the identical instant
    import spark.implicits._
    val nanos = Seq((1L, 1704067200123456000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fromNanos = Tables.normalizeEventTs(nanos).select(unix_micros(col("ts"))).head().getLong(0)
    assert(fromNanos === 1704067200123456L)
  }

  test("streaming source reads the same schema the batch reader pins") {
    // readStream requires an up-front schema; it must match the batch probe
    val s = graft.streaming.EventStream.readEvents(spark,
      s"${TestSpark.Sf0001}/events.parquet")
    assert(s.isStreaming)
    assert(s.schema("ts").dataType === TimestampType)
    assert(s.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
