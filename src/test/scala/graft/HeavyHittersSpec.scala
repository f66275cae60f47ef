package graft

import graft.functions.{HHCounter, SpaceSaving}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving guarantees against the exact aggregate on real data:
  * every true heavy hitter surfaces, and every reported count brackets the
  * true count within the carried error. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(k: Int): (Seq[HHCounter], Map[String, Long], Long) = {
    import spark.implicits._
    val words = Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .as[String]
    val sketch = words.select(new SpaceSaving(k).toColumn).collect()(0)
    val exact = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (sketch, exact, exact.values.sum)
  }

  test("every key with true count > n/k is in the sketch") {
    val k = 16
    val (sketch, exact, n) = run(k)
    assert(sketch.size <= k)
    val keys = sketch.map(_.key).toSet
    exact.filter(_._2 > n / k).keys.foreach { hh =>
      assert(keys.contains(hh), s"missed heavy hitter $hh")
    }
  }

  test("reported counts bracket true counts: true <= est <= true + err") {
    val (sketch, exact, _) = run(16)
    sketch.foreach { h =>
      val t = exact.getOrElse(h.key, 0L)
      assert(h.count >= t, s"${h.key}: est ${h.count} < true $t")
      assert(h.count - h.err <= t, s"${h.key}: est-err ${h.count - h.err} > true $t")
    }
  }

  test("exact regime: with k >= distinct keys the sketch IS the exact top") {
    val (sketch, exact, _) = run(1024) // vocabulary is far smaller
    assert(sketch.forall(_.err == 0L))
    sketch.foreach(h => assert(exact(h.key) == h.count))
    assert(sketch.map(_.key).toSet == exact.keySet)
  }
}
