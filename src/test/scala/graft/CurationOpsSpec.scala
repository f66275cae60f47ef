package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, EventTime, Multimodal, Relational, Sampling, Similarity, TextAnalysis}

/** Semantic contracts of the mixture-weight, power-user, shard-manifest,
  * and neighborhood-Jaccard operators, each checked against an independent
  * collect-side reimplementation (the oracle gate covers the SQL axis).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mixture weights reproduce the integer target-mix arithmetic") {
    val langs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang")).collect().map(_.getString(0))
    val byLang = langs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = langs.length.toLong
    val nLangs = byLang.size.toLong
    val rows = Sampling.mixtureWeights(spark, TestSpark.Sf0001).collect()
    assert(rows.length == nLangs)
    rows.foreach { r =>
      val n = byLang(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(3) == n * 10000 / total, "share_bp")
      assert(r.getLong(4) == total * 10000 / (nLangs * n), "repeat_bp")
      assert(r.getLong(5) == n * (total * 10000 / (nLangs * n)) / 10000,
        "planned_docs")
    }
    // the reweighted corpus should sit within one doc-per-lang of uniform
    val planned = rows.map(_.getLong(5))
    assert(planned.max - planned.min <= nLangs,
      s"planned docs far from uniform: ${planned.mkString(",")}")
  }

  test("power-user deciles form an exact Lorenz curve over per-user counts") {
    val perUser = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id")).collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (uid, n) => (-n, uid) }
    val counts = perUser.map(_._2)
    val nUsers = counts.length
    // ntile(10): first (n % 10) buckets get ceil(n/10) rows
    val base = nUsers / 10
    val extra = nUsers % 10
    val sizes = (1 to 10).map(d => if (d <= extra) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    val total = counts.sum
    val rows = EventTime.powerUsers(spark, TestSpark.Sf0001)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    var cum = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val slice = counts.slice(offsets(i), offsets(i + 1))
      cum += slice.sum
      assert(r.getInt(0) == i + 1)
      assert(r.getLong(1) == sizes(i), s"decile ${i + 1} user count")
      assert(r.getLong(2) == slice.sum, s"decile ${i + 1} event count")
      assert(r.getLong(3) == slice.sum * 10000 / total)
      assert(r.getLong(4) == cum * 10000 / total)
    }
    assert(rows.last.getLong(4) == 10000, "Lorenz curve must end at 10000 bp")
  }

  test("shard manifest tiles the byte stream contiguously and completely") {
    val items = Multimodal.features(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("n_bytes")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    // independent boundary-binned packing
    var cum = 0L
    val expected = items.map { case (id, b) =>
      val shard = cum / 16384; cum += b; (shard, id, b)
    }.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
    }.toMap
    val rows = Multimodal.shardManifest(spark, TestSpark.Sf0001)
      .orderBy("shard_id").collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, bytes, lo, hi) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((n, bytes, lo, hi)), s"shard ${r.getLong(0)}")
    }
    assert(rows.map(_.getLong(2)).sum == items.map(_._2).sum,
      "every byte lands in exactly one shard")
    // doc ranges are contiguous IN ID ORDER: each shard starts at the
    // successor of the previous shard's doc_hi within the sorted id
    // sequence (not doc_hi + 1 — doc_ids need not be gapless)
    val ids = items.map(_._1)
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        val successor = ids(ids.indexOf(w(0).getLong(4)) + 1)
        assert(w(1).getLong(3) == successor)
      }
    }
  }

  test("modality agreement reproduces set arithmetic over the two pair sets") {
    val lex = Dedup.ngramJaccard(spark, TestSpark.Sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Similarity.embeddingCosinePairs(spark, TestSpark.Sf0001)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = Dedup.modalityAgreement(spark, TestSpark.Sf0001).collect().head
    assert(r.getLong(0) == lex.size)
    assert(r.getLong(1) == sem.size)
    assert(r.getLong(2) == (lex & sem).size)
    val union = (lex | sem).size
    if (union == 0) assert(r.isNullAt(3))
    else assert(r.getDouble(3) == (lex & sem).size.toDouble / union)
  }

  test("threshold sweep is monotone and agrees with the declared threshold") {
    val rows = Dedup.thresholdSweep(spark, TestSpark.Sf0001)
      .orderBy("threshold_pct").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9).map(_ * 10))
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getLong(1) >= w(1).getLong(1), "sweep must be non-increasing")
    }
    // the 0.3 column is exactly the declared ngram-Jaccard query's pair count
    val atDeclared = rows.find(_.getInt(0) == 30).get.getLong(1)
    assert(atDeclared == Dedup.ngramJaccard(spark, TestSpark.Sf0001).count())
  }

  test("curriculum phases tile the corpus by quality rank") {
    val docs = TextAnalysis.qualityScore(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("n_tokens"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    val n = docs.length
    val base = n / 4
    val extra = n % 4
    val sizes = (1 to 4).map(p => if (p <= extra) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    val rows = Sampling.curriculum(spark, TestSpark.Sf0001)
      .orderBy("phase").collect()
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      val slice = docs.slice(offsets(i), offsets(i + 1))
      assert(r.getInt(0) == i + 1)
      assert(r.getLong(1) == sizes(i))
      assert(r.getLong(2) == slice.map(_._2).sum, s"phase ${i + 1} tokens")
      assert(r.getDouble(3) == slice.map(_._3).min, s"phase ${i + 1} min q")
      assert(r.getDouble(4) == slice.map(_._3).max, s"phase ${i + 1} max q")
    }
    // phases are quality-ordered: each phase's floor ≥ the next phase's cap
    rows.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getDouble(3) >= w(1).getDouble(4))
    }
  }

  test("winnow pairs match an independent JVM winnowing recomputation") {
    import org.apache.spark.unsafe.types.UTF8String
    def h60(s: String) = graft.functions.Hash60.hash(UTF8String.fromString(s))
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fps = docs.collect { case (id, text) if text.length >= 8 =>
      val grams = (0 to text.length - 8).map(i => h60(text.substring(i, i + 8)))
      id -> (0 to grams.length - 16).map(p => grams.slice(p, p + 16).min).toSet
    }.filter(_._2.nonEmpty)
    val df = fps.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val capped = fps.map { case (id, s) => id -> s.filter(df(_) <= 64) }
    val expected = (for {
      (a, sa) <- capped; (b, sb) <- capped if a < b
      shared = (sa & sb).size if shared >= 2
    } yield (a, b) -> shared.toLong).toMap
    val rows = Dedup.winnowPairs(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == expected)
  }

  test("gini profile reproduces exact impurity arithmetic") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def expected(vals: Seq[String]) = {
      val counts = vals.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = vals.length.toDouble
      (counts.size.toLong, 1.0 - counts.values.map(c => c * c).sum.toDouble / (n * n))
    }
    val byCol = Map("lang" -> expected(docs.map(_._1).toSeq),
      "source" -> expected(docs.map(_._2).toSeq))
    Relational.giniProfile(spark, TestSpark.Sf0001).collect().foreach { r =>
      val (nd, g) = byCol(r.getString(0))
      assert(r.getLong(1) == nd)
      assert(math.abs(r.getDouble(2) - g) < 1e-12)
    }
  }

  test("skyline equals the brute-force dominance definition") {
    val parts = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_partkey"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS LONG)"),
        col("p_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominates(a: (Long, Long, Int), b: (Long, Long, Int)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val expected = parts.filter(q => !parts.exists(p => dominates(p, q)))
      .map(_._1).toSet
    val got = Relational.skyline(spark, TestSpark.Sf0001)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("anomaly days reproduce the integer 3-sigma boundary") {
    import scala.math.BigInt
    val counts = Tables.events(spark, TestSpark.Sf0001)
      .select(expr("datediff(to_date(ts), '1970-01-01')")).collect()
      .map(_.getInt(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = BigInt(counts.size)
    val s = counts.values.map(BigInt(_)).sum
    val q = counts.values.map(c => BigInt(c) * c).sum
    val rows = EventTime.anomalyDays(spark, TestSpark.Sf0001).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val c = BigInt(counts(r.getInt(0)))
      val expected = (n * c - s).pow(2) > 9 * (n * q - s * s)
      assert(r.getBoolean(2) == expected, s"day ${r.getInt(0)}")
      assert(r.getLong(1) == c.toLong)
    }
  }

  test("OHLC candles agree with an independent sort-and-pick per bucket") {
    val evs = Tables.events(spark, TestSpark.Sf0001)
      .select(expr("CAST(date_trunc('hour', ts) AS LONG)").as("h"),
        col("event_type"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expected = evs.groupBy(e => (e._1, e._2)).view.mapValues { g =>
      val sorted = g.sortBy(e => (e._3, e._4))
      (g.length.toLong, sorted.head._5, g.map(_._5).max, g.map(_._5).min, sorted.last._5)
    }.toMap
    val rows = EventTime.ohlc(spark, TestSpark.Sf0001).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val e = expected((r.getLong(0), r.getString(1)))
      assert((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        == e, s"bucket (${r.getLong(0)}, ${r.getString(1)})")
    }
  }

  test("neighborhood Jaccard matches a set-arithmetic recomputation") {
    val knn = Similarity.knnGraph(spark, TestSpark.Sf0001)
      .select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sym = knn.filter { case (a, b) => knn.contains((b, a)) }
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Similarity.neighborJaccard(spark, TestSpark.Sf0001).collect()
    val edges = sym.filter { case (a, b) => a < b }
    assert(rows.length == edges.size, "one row per canonical mutual edge")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(edges.contains((a, b)))
      val shared = (nbrs(a) & nbrs(b)).size.toLong
      val union = (nbrs(a) | nbrs(b)).size.toLong
      assert(r.getLong(2) == shared, s"shared count of ($a,$b)")
      assert(r.getLong(3) == nbrs(a).size.toLong)
      assert(r.getLong(4) == nbrs(b).size.toLong)
      assert(r.getDouble(5) == shared.toDouble / union, s"jaccard of ($a,$b)")
    }
  }
}
