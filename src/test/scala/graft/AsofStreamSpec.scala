package graft

import graft.streaming.AsofStream
import graft.streaming.AsofStream.{Enriched, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming as-of TTL enrichment: (1) the TTL law on crafted events —
  * fresh click matched, stale click nulled; (2) the parity gate — streamed
  * over the REAL sf0.001 events in event-time order, the result must equal
  * the batch `win_asof_tolerance` projection row for row. The batch side
  * keeps every click forever and nulls stale matches at read time; the
  * stream evicts clicks past the TTL. Parity holding on real data is the
  * proof that eviction is semantics-preserving, not an approximation. */
class AsofStreamSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def tsAt(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def key(e: Enriched) =
    e.purchase_id -> (e.asof_click_id, e.gap_us, e.within_tolerance)

  test("TTL law: fresh click matched, stale click nulled, state evicted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000000L
    // keep clear of epoch 0: the initial watermark is 0, and a first-batch
    // event AT the watermark is dropped as late
    val base = 10 * day
    val input = MemoryStream[Ev]
    val q = AsofStream.enrich(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("asof_ttl").start()
    try {
      input.addData(
        Ev(1, 7, tsAt(base), "click"),
        Ev(2, 7, tsAt(base + 1000000L), "purchase"), // 1 s after the click
        Ev(3, 7, tsAt(base + day / 2), "view")) // ignored type
      q.processAllAvailable()
      // 2 days later: the stored click is past TTL -> NULL, state evictable
      input.addData(Ev(4, 7, tsAt(base + 2 * day), "purchase"))
      q.processAllAvailable()
      input.addData( // a new click re-arms the state after eviction
        Ev(5, 7, tsAt(base + 3 * day), "click"),
        Ev(6, 7, tsAt(base + 3 * day + 5000000L), "purchase"))
      q.processAllAvailable()
      val got = spark.table("asof_ttl").as[Enriched].collect().map(key).toMap
      assert(got(2L) === ((Some(1L), Some(1000000L), true)))
      assert(got(4L) === ((None, None, false)))
      assert(got(6L) === ((Some(5L), Some(5000000L), true)))
    } finally q.stop()
  }

  test("streamed TTL enrichment equals batch win_asof_tolerance on real data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = TestSpark.Sf0001
    val evs = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[Ev].collect().sortBy(e => (e.ts_us, e.event_id))
    // batches split on ts boundaries so equal-ts groups never straddle one
    val cuts = Seq(evs.length / 4, evs.length / 2, 3 * evs.length / 4)
      .map(i => evs(i).ts_us)
    val batches = (cuts :+ Long.MaxValue).zip(Long.MinValue +: cuts)
      .map { case (hi, lo) => evs.filter(e => e.ts_us >= lo && e.ts_us < hi) }
      .filter(_.nonEmpty)

    val input = MemoryStream[Ev]
    val q = AsofStream.enrich(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("asof_parity").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("asof_parity").as[Enriched].collect().map(key).toMap

      val batch = graft.operators.Windows.asofTolerance(spark, dir).collect()
        .map { r =>
          r.getAs[Long]("purchase_id") -> ((
            if (r.isNullAt(r.fieldIndex("asof_click_id"))) None
            else Some(r.getAs[Long]("asof_click_id")),
            if (r.isNullAt(r.fieldIndex("gap_us"))) None
            else Some(r.getAs[Long]("gap_us")),
            r.getAs[Boolean]("within_tolerance")))
        }.toMap

      assert(streamed.size === batch.size)
      assert(streamed === batch)
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3))
    } finally q.stop()
  }
}
