package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the banding parameters of the SimHash and MinHash-LSH near-dup
  * pipelines on a second geometry, pinning the properties the parameters
  * are supposed to control:
  *   - SimHash with b bands guarantees recall of every pair with Hamming
  *     distance < b (pigeonhole: fewer flipped bits than bands ⇒ one band
  *     is untouched ⇒ the equi-join finds the pair);
  *   - every emitted pair respects the Hamming/Jaccard threshold;
  *   - exact-duplicate documents (identical signatures) are found under ANY
  *     geometry, since every band key matches.
  */
class BandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("simhash 6x10 banding: pigeonhole recall for hamming < 6, threshold respected") {
    // ground truth from the digests themselves (small corpus: all-pairs ok in-test)
    val digests = Dedup.simhash(spark, TestSpark.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val ground = for {
      i <- digests.indices; j <- (i + 1) until digests.length
      h = java.lang.Long.bitCount(digests(i)._2 ^ digests(j)._2)
      if h <= 5
    } yield (digests(i)._1, digests(j)._1, h)

    val got = Dedup.simhashPairs(spark, TestSpark.Sf0001, nBands = 6, bandBits = 10, hammingMax = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got.foreach { case (_, _, h) => assert(h <= 5) }
    // hamming <= 5 < 6 bands => guaranteed candidate => guaranteed in output
    ground.foreach { p => assert(got.contains(p), s"pigeonhole miss: $p") }
    assert(got.size == ground.size)
  }

  test("minhash-lsh 16x4 geometry: thresholds respected, exact dups always found") {
    val pairs = Dedup.minhashLsh(spark, TestSpark.Sf0001, numPerms = 16, numBands = 4)
      .collect()
    pairs.foreach { r =>
      assert(r.getDouble(3) >= 0.3, s"jaccard below threshold: $r")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // identical texts have identical signatures under any geometry — every
    // band matches, so the pair must surface with exact jaccard 1.0
    val dups = Dedup.exact(spark, TestSpark.Sf0001).collect()
      .filter(_.getLong(1) > 1)
    if (dups.nonEmpty) {
      val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      // recover the full id list per duplicated text from the fingerprint path
      val byText = Tables.documents(spark, TestSpark.Sf0001).collect()
        .map(r => r.getString(1) -> r.getLong(0))
        .groupBy(_._1).filter { case (text, grp) =>
          // docs under 3 tokens have no 3-gram shingles, hence no signature
          grp.length > 1 && text.trim.split("\\s+").length >= 3
        }.values
      byText.foreach { grp =>
        val ids = grp.map(_._2).sorted
        ids.combinations(2).foreach { case Array(a, b) =>
          assert(found.contains((a, b)), s"exact dup pair ($a,$b) missed")
        }
      }
    }
  }
}
