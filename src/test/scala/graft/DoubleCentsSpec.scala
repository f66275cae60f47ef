package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 honesty gate for the exact cents fast path:
  * [[graft.functions.DoubleCents]] must be null-safe-equal to
  * `(CAST(x AS DECIMAL(18,2)) * 100)::BIGINT` — the composed-cast form —
  * on real measure columns and on adversarial boundary doubles (3-decimal
  * ties, negatives, magnitudes past the fast-path bound, precision
  * overflow, NaN/Inf). */
class DoubleCentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def castCents(c: org.apache.spark.sql.Column) =
    (Q.dec(c) * 100).cast("long")

  // NULL-on-error cast semantics (what DoubleCents implements): under the
  // session's ANSI mode a plain CAST throws on NaN/Inf/precision overflow,
  // so the adversarial-regime reference is try_cast — identical to CAST on
  // every representable value, NULL exactly where DoubleCents is.
  private val tryCastCents =
    (expr("try_cast(x AS DECIMAL(18,2))") * 100).cast("long")

  test("DoubleCents equals the DECIMAL(18,2) cast on every real measure") {
    val cols = Seq(
      Tables.lineitem(spark, dir).select(col("l_quantity").as("x")),
      Tables.lineitem(spark, dir).select(col("l_extendedprice").as("x")),
      Tables.orders(spark, dir).select(col("o_totalprice").as("x")),
      Tables.customer(spark, dir).select(col("c_acctbal").as("x")))
    cols.foreach { df =>
      val diff = df
        .select(Q.cents(col("x")).as("n"), castCents(col("x")).as("c"))
        .filter(not(col("n") <=> col("c"))).count()
      assert(diff === 0L, df.columns.mkString)
    }
  }

  test("DoubleCents on adversarial boundary doubles") {
    import spark.implicits._
    val cases = Seq[Option[Double]](
      Some(0.005), Some(1.005), Some(2.675), Some(-1.005), Some(-2.675),
      Some(0.004999999999999999), Some(123.456), Some(-123.456),
      Some(0.0), Some(-0.0), Some(1.0), Some(90.0), Some(90.004),
      Some(90.005), Some(89.995), Some(-90.005),
      Some(1.7592186044416e13),  // fast-path magnitude bound
      Some(1.7592186044417e13), Some(9.999999999999998e15),
      Some(1e16), Some(1e17), Some(1e18),  // precision-overflow regime
      Some(-1e18), Some(4.9e15), Some(Double.MinPositiveValue),
      Some(Double.MaxValue), Some(-Double.MaxValue),
      Some(Double.NaN), Some(Double.PositiveInfinity),
      Some(Double.NegativeInfinity), None)
    val rows = cases.toDF("x")
      .select(col("x"), Q.cents(col("x")).as("n"), tryCastCents.as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch at ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2), s"value mismatch at ${r.get(0)}")
    }
    // interpreted path must agree with codegen: evaluate via a driver loop
    cases.flatten.filterNot(d => d.isNaN || d.isInfinite).foreach { d =>
      val viaCast = new java.math.BigDecimal(java.lang.Double.toString(d))
      val n = graft.functions.DoubleCents.centsOrNull(d)
      if (n != null)
        assert(java.math.BigDecimal.valueOf(n.longValue, 2) ===
          viaCast.setScale(2, java.math.RoundingMode.HALF_UP),
          s"driver recompute mismatch at $d")
    }
  }

  test("analytics_big_orders output is unchanged vs the DECIMAL form") {
    val now = SparkEntry.queries("analytics_big_orders")(spark, dir)
    assert(now.columns.toSeq === Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    // round-17 body, verbatim
    val li = Tables.lineitem(spark, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(Q.dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 90)
      .select(col("l_orderkey").as("big_key"))
    val old = Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("big_key"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() > 0)
  }
}
