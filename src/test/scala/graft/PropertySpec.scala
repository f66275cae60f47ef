package graft

import graft.operators.Medallion
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5): cleanup idempotence, filter
  * composition, distinct containment, top-k = head of full sort. ScalaCheck
  * generators with fixed seeds (the scalatest bridge artifact is not in the
  * offline dependency set), run through real Spark plans on small frames. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic samples from a generator: one per seed. */
  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(Gen.zip(g1, g2)).foreach { case (a, b) => f(a, b) }

  private val messyString: Gen[String] = for {
    core <- Gen.alphaNumStr.map(_.take(12))
    padL <- Gen.choose(0, 3).map(" " * _)
    padR <- Gen.choose(0, 3).map(" " * _)
    upper <- Gen.oneOf(true, false)
  } yield padL + (if (upper) core.toUpperCase else core) + padR

  test("silver cleanup (lower∘trim) is idempotent") {
    forAll(Gen.listOfN(20, messyString)) { xs =>
      import spark.implicits._
      val df = xs.toDF("s")
      val once = df.select(lower(trim(col("s"))).as("c")).collect().map(_.getString(0))
      val twice = df.select(lower(trim(lower(trim(col("s"))))).as("c"))
        .collect().map(_.getString(0))
      assert(once.sameElements(twice))
    }
  }

  test("filter conjunction ≡ composed filters, and is order-insensitive") {
    forAll(Gen.listOfN(30, Gen.zip(Gen.choose(-50.0, 50.0), Gen.choose(-5.0, 5.0)))) { xs =>
      import spark.implicits._
      val df = xs.toDF("amount", "qty")
      val conj = df.filter(col("amount") > 0 && col("qty") > 0).count()
      val composed = df.filter(col("qty") > 0).filter(col("amount") > 0).count()
      assert(conj == composed)
    }
  }

  test("distinct output ⊆ input and is duplicate-free") {
    forAll(Gen.listOfN(40, Gen.choose(0, 5))) { xs =>
      import spark.implicits._
      val df = xs.toDF("k")
      val d = df.distinct().collect().map(_.getInt(0)).toSeq
      assert(d.toSet.subsetOf(xs.toSet))
      assert(d.distinct.size == d.size)
    }
  }

  test("orderBy+limit(k) = take-k of full sort (top-k correctness)") {
    forAll(Gen.listOfN(30, Gen.choose(-1000, 1000)), Gen.choose(1, 10)) { (xs, k) =>
      import spark.implicits._
      val df = xs.zipWithIndex.toDF("v", "id")
      val topk = df.orderBy(col("v").desc, col("id")).limit(k)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val full = df.orderBy(col("v").desc, col("id"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.take(k)
      assert(topk == full)
    }
  }

  test("native n-grams ≡ HOF reference on arbitrary whitespace-ridden text") {
    import graft.functions.TextFns
    import spark.implicits._
    // adversarial text: random runs of words, spaces, tabs, newlines,
    // multibyte chars, and empty segments
    val weirdText: Gen[String] = Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(" "), Gen.const("\t"), Gen.const("\n"), Gen.const("  "),
      Gen.const("wörd"), Gen.const("日本語"), Gen.const(""))).map(_.mkString)
    forAll(Gen.listOfN(12, weirdText), Gen.choose(1, 4)) { (texts, n) =>
      val df = texts.toDF("text")
      val wordDiff = df.select(
        TextFns.wordNGrams(col("text"), n).as("fast"),
        TextFns.shingles(TextFns.tokens(col("text")), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(wordDiff == 0, s"word n=$n over $texts")
      val charDiff = df.select(
        TextFns.charNGrams(col("text"), n).as("fast"),
        TextFns.charGrams(col("text"), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(charDiff == 0, s"char n=$n over $texts")
    }
  }

  test("zero-sale COUNT(col) semantics hold for arbitrary orphan dims") {
    import spark.implicits._
    forAll(Gen.choose(1, 8), Gen.choose(0, 5)) { (nParts, nSalesPerPart) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      val parts = (1 to nParts).map(i =>
        (i.toLong, s"p$i", "B", "T", 1, 10.0))
        .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      // only even part ids get sales
      val sales = (1 to nParts).filter(_ % 2 == 0).flatMap(i =>
        (1 to nSalesPerPart).map(j =>
          (j.toLong, i.toLong, 1L, j, 1.0, 5.0, 0.0, 0.0, "N", "O",
            java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate")
      parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
      sales.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val m = Medallion.goldProductMetrics(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      (1 to nParts).foreach { i =>
        val expected = if (i % 2 == 0) nSalesPerPart.toLong else 0L
        assert(m(i.toLong) == expected, s"part $i")
      }
    }
  }
}
