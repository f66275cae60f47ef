package graft

import graft.functions.ZValue
import graft.sources.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the clustering property that makes footer-stats pruning
  * work on BOTH filter columns. Measured directly on the written files —
  * each file's per-column (max−min) span — because that span is exactly
  * what parquet min/max row-group pruning keys on.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zvalue interleaves bits; adjacency in z implies proximity in both keys") {
    assert(ZValue.interleave(0L, 0L) == 0L)
    assert(ZValue.interleave(1L, 0L) == 1L)
    assert(ZValue.interleave(0L, 1L) == 2L)
    assert(ZValue.interleave(3L, 3L) == 15L)
    assert(ZValue.interleave(-5L, 7L) == ZValue.interleave(0L, 7L), "negative clamps")
    // monotone within a fixed co-key on each argument's low bits
    assert(ZValue.interleave(5L, 9L) != ZValue.interleave(9L, 5L), "asymmetric")
  }

  test("z-ordered files cover small rectangles in BOTH keys; linear sort does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, TestSpark.Sf001)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val nFiles = 16

    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$dir/z", nFiles)
    Layout.linearWrite(li, "l_partkey", s"$dir/linear", nFiles)

    def avgSpans(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("pk_span"),
          (max("l_suppkey") - min("l_suppkey")).as("sk_span"))
        .collect()
      (byFile.map(_.getLong(1)).sum.toDouble / byFile.length,
        byFile.map(_.getLong(2)).sum.toDouble / byFile.length)
    }
    val stats = li.agg(
      (max("l_partkey") - min("l_partkey")).cast("double"),
      (max("l_suppkey") - min("l_suppkey")).cast("double")).collect()(0)
    val (pkGlobal, skGlobal) = (stats.getDouble(0), stats.getDouble(1))

    val (zPk, zSk) = avgSpans(s"$dir/z")
    val (linPk, linSk) = avgSpans(s"$dir/linear")

    // linear layout: leading column tightly clustered, second at ~full width
    assert(linPk < pkGlobal / 4, s"linear pk span $linPk vs global $pkGlobal")
    assert(linSk > skGlobal * 0.5, s"linear sk span $linSk should be ~unclustered")
    // z-order: BOTH columns span well under the global range per file
    assert(zPk < pkGlobal / 2, s"z pk span $zPk vs global $pkGlobal")
    assert(zSk < skGlobal / 2, s"z sk span $zSk vs global $skGlobal")
    // and the content round-trips unchanged
    assert(spark.read.parquet(s"$dir/z").count() == li.count())
  }

  test("zone-map pruning SKIPS files: rectangle read touches few z files, answers exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zskip").toString
    val li = Tables.lineitem(spark, TestSpark.Sf001)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val nFiles = 16
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$dir/z", nFiles)
    Layout.linearWrite(li, "l_partkey", s"$dir/linear", nFiles)

    // the zone map: per-file min/max of both keys (what rel_zone_maps
    // computes as a query; here it drives an actual pruned read — the
    // data-skipping step a table format runs from its stats manifest)
    def zoneMap(path: String): Array[(String, Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("pk_lo"), max("l_partkey").as("pk_hi"),
          min("l_suppkey").as("sk_lo"), max("l_suppkey").as("sk_hi"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // a selective rectangle in BOTH keys (~10% of each key range)
    val s = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val (pkLo, pkHi, skLo, skHi) = (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
    val (pa, pb) = (pkLo + (pkHi - pkLo) * 2 / 10, pkLo + (pkHi - pkLo) * 3 / 10)
    val (sa, sb) = (skLo + (skHi - skLo) * 2 / 10, skLo + (skHi - skLo) * 3 / 10)
    val pred = col("l_partkey").between(pa, pb) && col("l_suppkey").between(sa, sb)

    val zSelected = zoneMap(s"$dir/z").collect {
      case (f, plo, phi, slo, shi) if phi >= pa && plo <= pb && shi >= sa && slo <= sb => f
    }
    // z-layout: each file covers a small key rectangle, so the zone map
    // prunes MOST files for a rectangle predicate
    assert(zSelected.length <= nFiles / 2,
      s"zone map should skip most z files, selected ${zSelected.length}/$nFiles")
    // linear layout, same predicate projected on the SECOND key only:
    // suppkey is unclustered, so its zone map prunes ~nothing — the
    // contrast that justifies the z layout
    val linSelectedSk = zoneMap(s"$dir/linear").collect {
      case (f, _, _, slo, shi) if shi >= sa && slo <= sb => f
    }
    assert(linSelectedSk.length >= nFiles * 3 / 4,
      s"linear layout should NOT prune on the second key " +
        s"(${linSelectedSk.length}/$nFiles)")

    // the pruned read really reads only the selected files…
    val pruned = spark.read.parquet(zSelected.toIndexedSeq: _*).filter(pred)
    assert(pruned.inputFiles.length == zSelected.length)
    // …and answers the query exactly (zone-map pruning is lossless)
    val full = spark.read.parquet(s"$dir/z").filter(pred)
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum("l_quantity")).collect()(0).getDouble(0)
      == full.agg(sum("l_quantity")).collect()(0).getDouble(0))
  }
}
