package graft

import graft.operators.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-sampling invariants: splits partition the corpus, the
  * sample is a stable subset (identical across runs by construction, not
  * by seed), and the balanced variant respects the per-stratum cap. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("split assignment partitions the corpus, roughly 80/10/10") {
    val rows = Sampling.splitAssign(spark, TestSpark.Sf001).collect()
    val total = Tables.documents(spark, TestSpark.Sf001).count()
    assert(rows.length == total, "every doc gets exactly one split")
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length.toDouble / total)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(math.abs(bySplit("train") - 0.8) < 0.08, s"train=${bySplit("train")}")
    assert(math.abs(bySplit("val") - 0.1) < 0.06)
    assert(math.abs(bySplit("test") - 0.1) < 0.06)
  }

  test("hash sample is a stable subset, disjointness with split is hash-consistent") {
    val s1 = Sampling.hashSample(spark, TestSpark.Sf001).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(spark, TestSpark.Sf001).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "no RNG: identical across runs")
    assert(s1.nonEmpty)
    val total = Tables.documents(spark, TestSpark.Sf001).count().toDouble
    assert(math.abs(s1.size / total - 0.1) < 0.06, s"fraction=${s1.size / total}")
    // bucket<10 ⊂ bucket<80 ⇒ every sampled doc is a train doc
    val train = Sampling.splitAssign(spark, TestSpark.Sf001).collect()
      .filter(_.getString(2) == "train").map(_.getLong(0)).toSet
    assert(s1.subsetOf(train))
  }

  test("balanced sample keeps at most the cap per stratum, dense ranks") {
    val rows = Sampling.balancedSample(spark, TestSpark.Sf001).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length <= 50, s"$lang over cap")
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length), s"$lang ranks not dense")
    }
  }
}
