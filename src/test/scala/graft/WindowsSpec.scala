package graft

import graft.operators.{EventTime, Windows}
import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("running total is monotone per user and rn is dense from 1") {
    val rows = Windows.runningTotal(spark, TestSpark.Sf0001).collect()
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getInt(3))
      assert(ordered.map(_.getInt(3)).sameElements(1 to ordered.length))
      val totals = ordered.map(_.getDouble(4))
      totals.zip(totals.tail).foreach { case (a, b) =>
        assert(b >= a, "running sum of non-negative values must not decrease")
      }
    }
  }

  test("top-k per group emits at most 3 per brand, in price order") {
    val rows = Windows.topKPerGroup(spark, TestSpark.Sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("streaming hourly agg equals batch hourly agg (shared transform)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // stage the events file alone in a directory (streaming sources read dirs)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val streamed = EventStream.runToCompletion(spark, srcDir, "hourly_test")
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = EventTime.hourly(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }
}
