package graft

import graft.operators.{EventTime, Sampling, TextAnalysis}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Semantics pins for the round-9 curation operators, on crafted fixtures
  * where the expected output is computable by hand: duplicated-span
  * coverage (the exact-substring-dedup signal), water-filling token-budget
  * allocation, and day-over-day event-mix drift.
  */
class CurationBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** d1/d2 share exactly one 5-gram; d3 is disjoint; d4 is below 5 tokens. */
  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory("graft-span-docs").toString
    val docs = spark.createDataFrame(
      List(
        Row(1L, "a b c d e f", "en", "s1", 11L),
        Row(2L, "a b c d e x", "en", "s1", 11L),
        Row(3L, "u v w x y z", "en", "s2", 11L),
        Row(4L, "short text", "en", "s3", 10L)
      ).asJava, Tables.documentsSchema)
    docs.write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("dup_spans: shared 5-gram marks both owners, disjoint doc scores 0, short doc absent") {
    val rows = TextAnalysis.dupSpans(spark, docsDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // d1: spans {"a b c d e", "b c d e f"}; d2: {"a b c d e", "b c d e x"} —
    // the shared span is duplicated, the tail span is unique
    assert(rows(1L) == ((2L, 1L, 5000L)), s"d1 = ${rows(1L)}")
    assert(rows(2L) == ((2L, 1L, 5000L)), s"d2 = ${rows(2L)}")
    assert(rows(3L) == ((2L, 0L, 0L)), "d3 shares nothing")
    assert(!rows.contains(4L), "docs under 5 tokens have no spans")
  }

  test("token budget: water level is maximal — cap+1 would overshoot the budget") {
    // sources: s1 = 12 tokens (d1+d2), s2 = 6, s3 = 2; total 20, budget 5.
    // Water level C solves 3C <= 5 in the lowest segment: C = 1.
    val rows = Sampling.tokenBudget(spark, docsDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("s1") == ((12L, 1L, 1L, 1L)), s"s1 = ${rows("s1")}")
    assert(rows("s2") == ((6L, 1L, 1L, 1L)))
    assert(rows("s3") == ((2L, 1L, 1L, 1L)))
    val budget = 20L / 4
    val alloc = rows.values.map(_._2).sum
    assert(alloc <= budget, "allocation never exceeds the budget")
    val cap = rows.values.head._4
    val overshoot = rows.values.map(v => math.min(v._1, cap + 1)).sum
    assert(overshoot > budget, "cap is maximal: one more token per source overshoots")
  }

  test("drift: grid completion charges a vanishing type its full mass") {
    val dir = Files.createTempDirectory("graft-drift-events").toString
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    // day0: A=3 B=1; day1: A=1 B=1; day2: A absent B=2
    val events = Seq(
      (0, "A", 3), (0, "B", 1), (1, "A", 1), (1, "B", 1), (2, "B", 2)
    ).flatMap { case (d, t, n) => (0 until n).map(i => (d, t, i)) }
      .zipWithIndex.map { case ((d, t, i), id) =>
        Row(id.toLong, ts(d, i), 7L, t, 1.0, "{}")
      }
    spark.createDataFrame(events.asJava, Tables.eventsSchema)
      .write.parquet(s"$dir/events.parquet")
    val rows = EventTime.drift(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.size == 2, "first observed day has no predecessor")
    val d = rows.keys.min
    // day1: A (1-3)^2*10000/5 = 8000, B 0;  day2: A (0-1)^2*10000/2 = 5000,
    // B (2-1)^2*10000/4 = 2500 — the absent type still contributes
    assert(rows(d) == 8000L, s"day1 drift = ${rows(d)}")
    assert(rows(d + 1) == 7500L, s"day2 drift = ${rows(d + 1)}")
  }
}
