package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators. The reference has none (SURVEY §2.5) — these
  * are the extension tier's analytic vocabulary: running totals, per-group
  * top-k (the scalable replacement for global ORDER BY + LIMIT), and lag
  * deltas for event streams.
  *
  * Scale posture: every window partitions by a high-cardinality key
  * (user_id, p_brand) — one shuffle by that key, then per-partition sorted
  * evaluation; no global sort, no driver-side state.
  */
object Windows {

  /** Per-user running transaction total + row number (exact decimal running
    * sum, so partial-order evaluation can't drift). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        row_number().over(w).as("rn"),
        dec2(sum(dec(col("value"))).over(w)).as("running_value"))
  }

  val runningTotalSql: String =
    """SELECT event_id, user_id, event_type,
      |       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Top-3 parts by retail price within each brand — per-group top-k via
    * row_number, the scalable form of the reference's global
    * ORDER BY + LIMIT (`etl_medallion.py:352-356`). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"),
        row_number().over(w).as("rank_in_brand"))
      .filter(col("rank_in_brand") <= 3)
  }

  val topKPerGroupSql: String =
    """SELECT * FROM (
      |  SELECT p_brand, p_partkey, p_name, p_retailprice,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
      |                                 ORDER BY p_retailprice DESC, p_partkey) AS INTEGER)
      |           AS rank_in_brand
      |  FROM part)
      |WHERE rank_in_brand <= 3
      |ORDER BY p_brand, rank_in_brand""".stripMargin

  /** Per-user inter-event gap in microseconds (lag). */
  def lagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
  }

  val lagDeltaSql: String =
    """SELECT event_id, user_id,
      |       epoch_us(CAST(ts AS TIMESTAMP))
      |         - epoch_us(CAST(LAG(ts, 1) OVER (PARTITION BY user_id
      |                                          ORDER BY ts, event_id) AS TIMESTAMP))
      |         AS gap_us
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** As-of (carry-forward) join within one stream: each event annotated with
    * the user's most recent prior-or-equal 'signup' event — `last(…, ignore
    * nulls)` over an unbounded-preceding row frame. This is the composed-ops
    * form of an as-of join (SURVEY §2.3: absent in the reference); a
    * two-table as-of joins after a union of both sides tagged by source.
    */
  def asofLastSignup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true)
          .over(w).as("asof_signup_event"))
  }

  val asofLastSignupSql: String =
    """SELECT event_id, user_id, event_type,
      |       LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
      |         OVER (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_event
      |FROM events
      |ORDER BY event_id""".stripMargin

  private val SlideUs = 3600L * 1000000 // 1 hour

  /** Time-RANGE sliding frame: per event, the count and exact decimal sum of
    * the same user's events in the PRECEDING HOUR — a range frame over epoch
    * micros, not a row frame: all rows with equal timestamps enter together,
    * so the result is tie-order-independent by construction (the reason to
    * prefer RANGE when the order key can repeat). One shuffle on user_id. */
  def slidingHour(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-SlideUs, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        dec2(sum(dec(col("value"))).over(w)).as("value_last_hour"))
  }

  val slidingHourSql: String =
    s"""SELECT event_id, user_id,
       |       COUNT(*) OVER w AS n_last_hour,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_hour
       |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
       |      FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY us
       |             RANGE BETWEEN $SlideUs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** TWO-TABLE as-of join: each purchase annotated with the same user's most
    * recent prior-or-equal click — composed as union-tag + carry-forward
    * window (one shuffle on user_id, sorted scan, no range-join explosion).
    * Clicks are first deduped to one per (user, ts) (max event_id) so the
    * as-of pick is deterministic under timestamp ties on both engines.
    * The oracle runs DuckDB's NATIVE `ASOF LEFT JOIN` — a genuinely
    * different algorithm asserting the same semantics, which is the
    * strongest kind of differential check. At 100 TB this plan beats an
    * interval join when only the latest match matters: state is one row
    * per partition scan position, never a per-pair candidate set.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("src"),
        col("click_id"), lit(null).cast("long").as("purchase_id"))
      .unionByName(purchases.select(col("user_id"), col("ts"), lit(1).as("src"),
        lit(null).cast("long").as("click_id"), col("purchase_id")))
    // clicks sort before purchases at equal ts => "prior-or-equal" semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("src"), col("purchase_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts",
        last(when(col("src") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(
        col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("asof_click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))).as("gap_us"))
  }

  val asofJoinSql: String =
    """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS click_id
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS purchase_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
      |       c.click_id AS asof_click_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  /** The SAME as-of semantics as [[asofJoin]], computed by the CUSTOM
    * physical operator ([[graft.plans.AsOfJoinExec]] via the injected
    * planner strategy): per-side shuffles on the key, per-partition merge
    * with O(1) state, no union/null-padding pass. Three independent
    * algorithms — window carry-forward (Spark), native ASOF (DuckDB
    * oracle), and this merge exec — are all held to identical output. */
  def asofJoinCustom(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    graft.plans.AsOf.joinBackward(purchases, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(
        col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("click_id").as("asof_click_id"),
        (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Decile assignment per group (ntile): the bucketed form of quantile
    * features for model inputs — deterministic because the window order is
    * totalized with the event_id tiebreak (ntile is position-based, so an
    * untotalized order would be partition-luck). */
  def ntileDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        ntile(10).over(w).as("decile"))
  }

  val ntileDecilesSql: String =
    """SELECT event_id, event_type, value,
      |       CAST(NTILE(10) OVER (PARTITION BY event_type
      |                            ORDER BY value, event_id) AS INTEGER) AS decile
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Relative-position window features: percent_rank ((rank−1)/(N−1)) and
    * cume_dist (rows ≤ current / N) of each event's value within its type —
    * the normalized-rank features a model pipeline derives per stratum. The
    * order is totalized with the event_id tiebreak, so rank = row_number
    * and both ratios are exact int/int divisions — bit-identical across
    * engines. One shuffle on event_type. */
  def percentRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  val percentRanksSql: String =
    """SELECT event_id, event_type, value,
      |       PERCENT_RANK() OVER (PARTITION BY event_type
      |                            ORDER BY value, event_id) AS pr,
      |       CUME_DIST() OVER (PARTITION BY event_type
      |                         ORDER BY value, event_id) AS cd
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Calendar gap-fill + forward fill: per-priority daily order series
    * densified over the full [min, max] day span (sequence-explode — no
    * calendar dim table to maintain), missing days get n_orders = 0 and a
    * forward-filled revenue carry (`last(..., ignoreNulls)` over the dense
    * series). The reshape every time-series consumer needs before rolling
    * metrics — a model-training feature pipeline can't tolerate missing
    * rows. Days are epoch-day INTEGERS (DATE columns hash
    * engine-specifically). Scale: the aggregation reduces the fact table
    * FIRST; the dense series is bounded by groups × span-days regardless of
    * input rows, and the fill window partitions by group over that bounded
    * series. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"), day.as("day"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("total"))
    val dense = daily.groupBy(col("prio"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("prio"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("prio")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(daily, Seq("prio", "day"), "left")
      .select(
        col("prio"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        last(dec2(col("total")), ignoreNulls = true).over(w).as("filled_total"))
  }

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         COUNT(*) AS n,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM orders GROUP BY 1, 2),
      |dense AS (
      |  SELECT prio, CAST(unnest(generate_series(MIN(day), MAX(day))) AS BIGINT) AS day
      |  FROM daily GROUP BY prio)
      |SELECT d.prio, d.day,
      |       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders,
      |       last_value(a.total IGNORE NULLS)
      |         OVER (PARTITION BY d.prio ORDER BY d.day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
      |FROM dense d LEFT JOIN daily a ON d.prio = a.prio AND d.day = a.day
      |ORDER BY d.prio, d.day""".stripMargin

  /** Gaps-and-islands: per-user consecutive-active-day streaks via the
    * `day − row_number` grouping trick (consecutive days share a constant
    * difference), then per-user streak stats. The engagement/retention
    * primitive; one shuffle on user_id for the window, one for the streak
    * aggregate — both keyed on high-cardinality user_id. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
  }

  val streaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      |  FROM events),
      |islands AS (
      |  SELECT user_id,
      |         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, grp, COUNT(*) AS len
      |  FROM islands GROUP BY user_id, grp)
      |SELECT user_id,
      |       CAST(SUM(len) AS BIGINT) AS n_active_days,
      |       COUNT(*) AS n_streaks,
      |       CAST(MAX(len) AS BIGINT) AS longest_streak
      |FROM streaks
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** FORWARD as-of join (the lead-direction twin of [[asofJoin]]): each
    * purchase annotated with the user's FIRST click at-or-after it —
    * `first(…, ignore nulls)` over a current-row→unbounded-FOLLOWING frame
    * on the tagged union. Sort order (ts, src) with purchases before clicks
    * at equal ts puts an equal-timestamp click inside the frame, giving
    * at-or-after semantics; gap is NULL when no later click exists. Same
    * single-shuffle cost profile as the backward form. */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val tagged = purchases
      .select(col("user_id"), col("ts"), lit(0).as("src"),
        lit(null).cast("long").as("click_id"), col("purchase_id"))
      .unionByName(clicks.select(col("user_id"), col("ts"), lit(1).as("src"),
        col("click_id"), lit(null).cast("long").as("purchase_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("src"), col("purchase_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("next_click_id", first(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("next_click_ts",
        first(when(col("src") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("src") === 0)
      .select(
        col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("next_click_id"),
        (unix_micros(col("next_click_ts")) - unix_micros(col("ts"))).as("gap_us"))
  }

  val asofForwardSql: String =
    """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(event_id) AS click_id
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS purchase_id
      |      FROM events WHERE event_type = 'purchase'),
      |tagged AS (
      |  SELECT user_id, ts, 0 AS src, NULL::BIGINT AS click_id, purchase_id FROM p
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS src, click_id, NULL::BIGINT AS purchase_id FROM c),
      |ann AS (
      |  SELECT *,
      |         FIRST_VALUE(click_id IGNORE NULLS) OVER win AS next_click_id,
      |         FIRST_VALUE(CASE WHEN src = 1 THEN ts END IGNORE NULLS) OVER win
      |           AS next_click_ts
      |  FROM tagged
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, src, purchase_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT purchase_id, user_id, ts AS purchase_ts, next_click_id,
      |       epoch_us(next_click_ts) - epoch_us(ts) AS gap_us
      |FROM ann WHERE src = 0
      |ORDER BY purchase_id""".stripMargin

  /** NEAREST as-of: each purchase matched to its nearest click in EITHER
    * direction — the min of the backward and forward gaps, ties to the
    * backward match (the attribution convention: a preceding click wins an
    * exact tie). Pure composition of [[asofJoin]] and [[asofForward]] on
    * the purchase key: both sides are one-shuffle window passes over the
    * same relation, and the final join is keyed on the (much smaller)
    * purchase set. Emits the direction for auditability; NULL-safe when
    * only one direction has a match. */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val back = asofJoin(spark, dir)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("asof_click_id").as("back_id"), col("gap_us").as("back_gap"))
    val fwd = asofForward(spark, dir)
      .select(col("purchase_id"), col("next_click_id").as("fwd_id"),
        col("gap_us").as("fwd_gap"))
    back.join(fwd, Seq("purchase_id"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        when(col("back_id").isNotNull &&
          (col("fwd_id").isNull || col("back_gap") <= col("fwd_gap")),
          lit("backward")).otherwise(lit("forward")).as("direction"),
        when(col("back_id").isNotNull &&
          (col("fwd_id").isNull || col("back_gap") <= col("fwd_gap")),
          col("back_id")).otherwise(col("fwd_id")).as("nearest_click_id"),
        when(col("back_id").isNotNull &&
          (col("fwd_id").isNull || col("back_gap") <= col("fwd_gap")),
          col("back_gap")).otherwise(col("fwd_gap")).as("nearest_gap_us"))
  }

  val asofNearestSql: String =
    s"""WITH back AS (SELECT purchase_id, user_id, purchase_ts,
       |                     asof_click_id AS back_id, gap_us AS back_gap
       |              FROM ($asofJoinSql)),
       |fwd AS (SELECT purchase_id, next_click_id AS fwd_id, gap_us AS fwd_gap
       |        FROM ($asofForwardSql))
       |SELECT back.purchase_id, user_id, purchase_ts,
       |       CASE WHEN back_id IS NOT NULL
       |                 AND (fwd_id IS NULL OR back_gap <= fwd_gap)
       |            THEN 'backward' ELSE 'forward' END AS direction,
       |       CASE WHEN back_id IS NOT NULL
       |                 AND (fwd_id IS NULL OR back_gap <= fwd_gap)
       |            THEN back_id ELSE fwd_id END AS nearest_click_id,
       |       CASE WHEN back_id IS NOT NULL
       |                 AND (fwd_id IS NULL OR back_gap <= fwd_gap)
       |            THEN back_gap ELSE fwd_gap END AS nearest_gap_us
       |FROM back JOIN fwd ON back.purchase_id = fwd.purchase_id
       |ORDER BY back.purchase_id""".stripMargin

  /** Weighted moving average (weights 4,3,2,1 over the last 4 orders) of a
    * customer's order totals — in EXACT integer cents, finalized with one
    * half-up division. A frame-SUM over doubles would be nondeterministic
    * across engines (sliding-window sums re-associate: Spark accumulates in
    * frame order, other engines use segment trees), so the frame is unrolled
    * into three LAGs and the weighted sum stays integral until the last
    * divide. Emitted from the 4th order on (no partial-window semantics to
    * disagree about). One shuffle on the partition key; the window itself is
    * sort-local within each customer. */
  def weightedMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (dec(col("o_totalprice")) * 100).cast("long").as("c"))
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        lag(col("c"), 1).over(w).as("l1"),
        lag(col("c"), 2).over(w).as("l2"),
        lag(col("c"), 3).over(w).as("l3"),
        col("c"))
      .filter(col("rn") >= 4)
      .select(col("o_orderkey"), col("o_custkey"), col("rn"),
        expr("CAST((2 * (4*c + 3*l1 + 2*l2 + l3) + 10) div 20 AS DOUBLE) / 100")
          .as("wma_price"))
  }

  val weightedMovingAvgSql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |           FROM orders),
      |w AS (SELECT o_orderkey, o_custkey,
      |             CAST(ROW_NUMBER() OVER win AS INTEGER) AS rn,
      |             LAG(c, 1) OVER win AS l1,
      |             LAG(c, 2) OVER win AS l2,
      |             LAG(c, 3) OVER win AS l3,
      |             c
      |      FROM o
      |      WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT o_orderkey, o_custkey, rn,
      |       CAST((2 * (4*c + 3*l1 + 2*l2 + l3) + 10) // 20 AS DOUBLE) / 100 AS wma_price
      |FROM w
      |WHERE rn >= 4
      |ORDER BY o_orderkey""".stripMargin

  /** Max staleness for [[asofTolerance]]: 1 day in µs. Shared with the
    * streaming analog ([[graft.streaming.AsofStream]]) so the batch and
    * stream TTL rules can never drift apart. */
  private[graft] val AsofToleranceUs = 86400000000L

  /** As-of join WITH TOLERANCE — the feature-store TTL rule
    * (`merge_asof(tolerance=...)`): a prior click only counts if it is at
    * most [[AsofToleranceUs]] old at purchase time; staler matches are
    * nulled, not substituted (a 3-week-old click is not a signal). Pure
    * post-projection over [[asofJoin]]'s carry-forward window — the
    * tolerance check costs nothing at any scale because the as-of plan
    * already carries the gap. `within_tolerance` makes the match-rate
    * auditable: the stream analog is state TTL eviction in a
    * `flatMapGroupsWithState` enrichment. */
  def asofTolerance(spark: SparkSession, dir: String): DataFrame =
    asofJoin(spark, dir).select(
      col("purchase_id"), col("user_id"), col("purchase_ts"),
      when(col("gap_us") <= AsofToleranceUs, col("asof_click_id"))
        .as("asof_click_id"),
      when(col("gap_us") <= AsofToleranceUs, col("gap_us")).as("gap_us"),
      (col("gap_us").isNotNull && col("gap_us") <= AsofToleranceUs)
        .as("within_tolerance"))

  val asofToleranceSql: String =
    s"""SELECT purchase_id, user_id, purchase_ts,
       |       CASE WHEN gap_us <= $AsofToleranceUs THEN asof_click_id END
       |         AS asof_click_id,
       |       CASE WHEN gap_us <= $AsofToleranceUs THEN gap_us END AS gap_us,
       |       COALESCE(gap_us <= $AsofToleranceUs, FALSE) AS within_tolerance
       |FROM (
       |$asofJoinSql
       |)
       |ORDER BY purchase_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("win_gap_fill", gapFill(_, _).orderBy("prio", "day"), Some(gapFillSql)),
    Q("win_streaks", streaks(_, _).orderBy("user_id"), Some(streaksSql)),
    Q("win_percent_rank", percentRanks(_, _).orderBy("event_id"), Some(percentRanksSql)),
    Q("win_running_total", runningTotal(_, _).orderBy("event_id"), Some(runningTotalSql)),
    Q("win_topk_per_group", topKPerGroup(_, _).orderBy("p_brand", "rank_in_brand"),
      Some(topKPerGroupSql)),
    Q("win_lag_delta", lagDelta(_, _).orderBy("event_id"), Some(lagDeltaSql)),
    Q("win_wma", weightedMovingAvg(_, _).orderBy("o_orderkey"),
      Some(weightedMovingAvgSql)),
    Q("win_asof_last_signup", asofLastSignup(_, _).orderBy("event_id"),
      Some(asofLastSignupSql)),
    Q("win_asof_join", asofJoin(_, _).orderBy("purchase_id"), Some(asofJoinSql)),
    Q("win_asof_forward", asofForward(_, _).orderBy("purchase_id"),
      Some(asofForwardSql)),
    Q("win_asof_nearest", asofNearest(_, _).orderBy("purchase_id"),
      Some(asofNearestSql)),
    Q("win_asof_custom", asofJoinCustom(_, _).orderBy("purchase_id"), Some(asofJoinSql)),
    Q("win_sliding_1h", slidingHour(_, _).orderBy("event_id"), Some(slidingHourSql)),
    Q("win_ntile_deciles", ntileDeciles(_, _).orderBy("event_id"), Some(ntileDecilesSql)),
    Q("win_asof_tolerance", asofTolerance(_, _).orderBy("purchase_id"),
      Some(asofToleranceSql)))
}
