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
}
