package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-gated TWO-PASS forms of the global ordered window — the round-11
  * verdict's last scale-killer family (a corpus-cardinality relation put
  * through ONE window partition is a single-task sort at 10⁹-10¹⁰ docs).
  *
  * Same shape as the `vecSide` / `PeelBroadcastRows` gates: BELOW
  * [[WindowGateRows]] the plain global window runs (one sort task — the
  * fastest plan at every tested scale, and the semantic spec the DuckDB
  * oracles execute); ABOVE it the identical arithmetic runs distributed:
  *
  *   1. deterministic equal-width range bucketing on the order key
  *      (a pure projection — rows never move for the bucketing itself),
  *   2. a per-bucket window (hash exchange on the bucket id; each task
  *      sorts only its bucket),
  *   3. bucket subtotals collected to the driver (≤ [[PrefixBuckets]]
  *      rows — a constant, never corpus-sized) and composed into
  *      exclusive offsets that broadcast back as a LocalRelation join.
  *
  * The arithmetic is integer (prefix sums, row counts), so the two
  * regimes are value-identical — the gate can only change the exchange
  * shape, never a result. Round12Spec pins regime equality on real data
  * and on adversarial tie/remainder cases; the over-gate plan is asserted
  * free of `Exchange SinglePartition`.
  *
  * Equal-width bucketing note: dense ids (doc_id) and bounded scores
  * (quality ∈ [0,1]) split evenly; a skewed key only skews bucket SIZES,
  * never correctness — a production deployment at known-skewed keys would
  * feed quantile boundaries (approx_percentile) into the same two passes.
  */
object TwoPass {

  /** Rows above which a global ordered window leaves the single-task
    * regime. Generous on purpose: a 2²⁰-row sort of narrow rows is
    * milliseconds for one task, and every tested scale (≤ 150k docs at
    * sf3) keeps today's oracle-serving plan. */
  private[graft] val WindowGateRows: Long = 1L << 20

  /** Bucket count for the distributed form — the unit of sort
    * parallelism AND the (constant) size of the driver-side offset
    * composition. */
  private[graft] val PrefixBuckets = 32

  /** Regime probe, the peel-gate idiom: the driver never receives more
    * than gate+1 rows, whatever the relation holds. Callers whose
    * windowed relation is expensive to produce (per-doc tokenization)
    * pass a cheap 1:1 `probe` relation instead — the probe decides the
    * REGIME only, never a value, so the single requirement is equal row
    * counts. */
  private[graft] def overGate(df: DataFrame, gate: Long): Boolean =
    df.limit(gate.min(Int.MaxValue - 2L).toInt + 1).count() > gate

  /** EXCLUSIVE prefix sum of `valCol` in `orderCol` (ascending, unique
    * long key) order, emitted as long column `outCol`. */
  private[graft] def prefixSum(df: DataFrame, orderCol: String,
      valCol: String, outCol: String,
      gate: Long = WindowGateRows,
      probe: Option[DataFrame] = None): DataFrame =
    if (!overGate(probe.getOrElse(df), gate)) {
      val w = Window.orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(outCol,
        coalesce(sum(col(valCol)).over(w).cast("long"), lit(0L)))
    } else distributedPrefixSum(df, orderCol, valCol, outCol)

  /** The over-gate form: per-bucket running sum + broadcast bucket
    * offsets. Two passes over `df` (the window and the subtotal
    * aggregate); the bucketing expression is deterministic, so the
    * passes agree without a persist. */
  private[graft] def distributedPrefixSum(df: DataFrame, orderCol: String,
      valCol: String, outCol: String,
      buckets: Int = PrefixBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df
      .agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long"))
      .collect().head
    if (stats.isNullAt(0)) return df.withColumn(outCol, lit(0L))
    val lo = stats.getLong(0)
    val width = math.max(1L, (stats.getLong(1) - lo) / buckets + 1)
    // monotone in the order key, ≤ buckets-1 by construction
    val tagged = df.withColumn("__bid",
      expr(s"(cast($orderCol as bigint) - (${lo}L)) div ${width}L"))
    val totals = tagged.groupBy(col("__bid"))
      .agg(sum(col(valCol)).cast("long").as("__tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offDf = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toSeq.toDF("__bid", "__off")
    val w = Window.partitionBy(col("__bid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("__local",
        coalesce(sum(col(valCol)).over(w).cast("long"), lit(0L)))
      .join(broadcast(offDf), Seq("__bid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__bid", "__local", "__off")
  }

  /** EXCLUSIVE running max of `valCol` over an INTEGER `orderCol` order
    * with a RANGE frame ending one below the current key — max over all
    * rows whose key ≤ current−1, ties at the current key excluded (the
    * skyline dominance test). Emitted as nullable long `outCol` (null ⇔
    * no strictly-smaller key exists). Integer keys matter: the bucketed
    * form relies on "row in an earlier bucket ⇒ key ≤ current−1", which
    * equal-width integer bucketing gives exactly. */
  private[graft] def prefixMaxExclusiveRange(df: DataFrame, orderCol: String,
      valCol: String, outCol: String,
      gate: Long = WindowGateRows,
      probe: Option[DataFrame] = None): DataFrame =
    if (!overGate(probe.getOrElse(df), gate)) {
      val w = Window.orderBy(col(orderCol))
        .rangeBetween(Window.unboundedPreceding, -1)
      df.withColumn(outCol, max(col(valCol)).over(w).cast("long"))
    } else distributedPrefixMax(df, orderCol, valCol, outCol)

  /** The over-gate form: per-bucket range-frame running max + broadcast
    * exclusive cross-bucket prefix maxes (max is associative — the same
    * two passes as the prefix sum). */
  private[graft] def distributedPrefixMax(df: DataFrame, orderCol: String,
      valCol: String, outCol: String,
      buckets: Int = PrefixBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df
      .agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long"))
      .collect().head
    if (stats.isNullAt(0))
      return df.withColumn(outCol, lit(null).cast("long"))
    val lo = stats.getLong(0)
    val width = math.max(1L, (stats.getLong(1) - lo) / buckets + 1)
    val tagged = df.withColumn("__bid",
      expr(s"(cast($orderCol as bigint) - (${lo}L)) div ${width}L"))
    val maxes = tagged.groupBy(col("__bid"))
      .agg(max(col(valCol)).cast("long").as("__mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // exclusive running max across buckets; the first bucket has none
    val prefix: Seq[(Long, Option[Long])] = maxes.map(_._1).zip(
      maxes.map(_._2).scanLeft(Option.empty[Long]) {
        (acc, m) => Some(acc.fold(m)(math.max(_, m)))
      }).toSeq
    val offDf = prefix.toDF("__bid", "__pmx")
    val w = Window.partitionBy(col("__bid")).orderBy(col(orderCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("__lmx", max(col(valCol)).over(w).cast("long"))
      .join(broadcast(offDf), Seq("__bid"))
      .withColumn(outCol, greatest(col("__lmx"), col("__pmx")))
      .drop("__bid", "__lmx", "__pmx")
  }

  /** Global `ntile(k)` over (`orderCol` DESC, `tieCol` ASC), emitted as
    * int column `outCol` — exactly Spark's NTile bucket arithmetic (the
    * first n % k tiles take ⌈n/k⌉ rows). */
  private[graft] def ntileDesc(df: DataFrame, orderCol: String,
      tieCol: String, k: Int, outCol: String,
      gate: Long = WindowGateRows,
      probe: Option[DataFrame] = None): DataFrame =
    if (!overGate(probe.getOrElse(df), gate)) {
      val w = Window.orderBy(col(orderCol).desc, col(tieCol))
      df.withColumn(outCol, ntile(k).over(w))
    } else distributedNtileDesc(df, orderCol, tieCol, k, outCol)

  /** The over-gate form: per-bucket row_number + broadcast exclusive row
    * counts give each row its exact global rank; the tile is then a pure
    * projection of (rank, n). Bucket edges follow Spark's DESC ordering
    * contract — NaN greatest (first), NULL last. */
  private[graft] def distributedNtileDesc(df: DataFrame, orderCol: String,
      tieCol: String, k: Int, outCol: String,
      buckets: Int = PrefixBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = col(orderCol).cast("double")
    val finite = df.filter(s.isNotNull && !isnan(s))
      .agg(min(s), max(s)).collect().head
    val (lo, hi) =
      if (finite.isNullAt(0)) (0.0, 0.0)
      else (finite.getDouble(0), finite.getDouble(1))
    val width = (hi - lo) / buckets
    val bidRaw =
      if (width > 0) floor((lit(hi) - s) / lit(width)).cast("int")
      else lit(0)
    val bid = when(s.isNull, lit(buckets - 1)) // DESC puts NULL last
      .when(isnan(s), lit(0)) // Spark orders NaN greatest → first
      .otherwise(least(greatest(bidRaw, lit(0)), lit(buckets - 1)))
    val tagged = df.withColumn("__bid", bid)
    val counts = tagged.groupBy(col("__bid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offDf = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq.toDF("__bid", "__roff")
    val q = n / k
    val r = n % k
    val cut = r * (q + 1)
    // Spark NTile: tiles 1..r have q+1 rows, tiles r+1..k have q rows;
    // with n < k (q = 0) the first branch covers every existing row, so
    // the div-by-zero arm below is unreachable (CASE evaluates lazily)
    val tile =
      if (q == 0L) col("__rn").cast("int")
      else when(col("__rn") <= cut, expr(s"(__rn - 1) div ${q + 1}L") + 1)
        .otherwise(lit(r) + expr(s"(__rn - 1 - ${cut}L) div ${q}L") + 1)
    val w = Window.partitionBy(col("__bid"))
      .orderBy(col(orderCol).desc, col(tieCol))
    tagged
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offDf), Seq("__bid"))
      .withColumn("__rn", col("__roff") + col("__lrn"))
      .withColumn(outCol, tile.cast("int"))
      .drop("__bid", "__lrn", "__roff", "__rn")
  }
}
