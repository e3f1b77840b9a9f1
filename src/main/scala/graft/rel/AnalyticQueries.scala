package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, sessionization, set ops, scalar-function surface,
  * date/JSON functions, rollup, scalar subqueries (SURVEY.md §2.2).
  *
  * Scale notes: window partitions are keyed on high-cardinality columns
  * (customer, user) so the shuffle is even; sessionization is a single
  * shuffle on user_id reused by both window steps and the final groupBy
  * (Catalyst collapses them into one exchange).
  */
object AnalyticQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** row_number top-N per group: 3 largest orders per market segment. */
  def q11TopOrdersPerSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"c_mktsegment", $"rn".cast("long").as("rn"), $"o_orderkey",
        round($"o_totalprice", 2).as("total_price"))
      .orderBy($"c_mktsegment", $"rn")
  }

  /** Running (cumulative) aggregate per key, ordered by event time. */
  def q12RunningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("running_value", round(sum($"value").over(w), 4))
      .select($"user_id", $"event_id", $"ts".cast("string").as("ts_str"),
        $"running_value")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /** lag(): inter-event gap in microseconds per user. */
  def q13EventDeltas(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .select($"user_id", $"event_id",
        coalesce(
          unix_micros($"ts".cast("timestamp")) -
            unix_micros($"prev_ts".cast("timestamp")),
          lit(-1L)).as("delta_us"))
      .orderBy($"user_id", $"event_id")
  }

  /** Exact distinct counts (expand-based multi-distinct aggregate). */
  def q14DistinctCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Set operations: UNION / INTERSECT / EXCEPT (distinct semantics). */
  def q15SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cn = t(s, dir, "customer").select($"c_nationkey".cast("long").as("nationkey"))
    val sn = t(s, dir, "supplier").select($"s_nationkey".cast("long").as("nationkey"))
    val u = cn.union(sn).distinct().withColumn("op", lit("union"))
    val i = cn.intersect(sn).withColumn("op", lit("intersect"))
    val e = cn.except(sn).withColumn("op", lit("except"))
    u.union(i).union(e)
      .select($"op", $"nationkey")
      .orderBy($"op", $"nationkey")
  }

  /** String-function surface: upper/substring/length/concat/replace/regexp. */
  def q16PartStrings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .filter($"p_name".rlike("^(red|blue) "))
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        substring($"p_name", 1, 4).as("name_prefix"),
        length($"p_name").cast("long").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "[aeiou]", "_").as("name_devowel"))
      .orderBy($"p_partkey")
  }

  /** Date-part extraction and grouping by calendar month. */
  def q17OrdersByMonth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"yr", $"mon")
  }

  /** Event-time tumbling window aggregation (batch form of the streaming
    * hourly rollup; date_trunc keeps the group key SQL-portable). */
  def q18HourlyEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"),
        round(avg($"value"), 6).as("avg_value"))
      .select($"hour_ts".cast("string").as("hour_str"), $"event_type",
        $"n_events", $"sum_value", $"avg_value")
      .orderBy($"hour_str", $"event_type")
  }

  /** Sessionization: 30-minute inactivity gap splits a user's events into
    * sessions — lag → flag → cumulative sum → per-session aggregate. */
  def q19Sessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .filter($"user_id" < 50)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) -
            unix_micros($"prev_ts".cast("timestamp")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(cum))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").cast("string").as("session_start"),
        max($"ts").cast("string").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** JSON extraction from the events props column. */
  def q20JsonEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        count($"k").as("n_with_k"),
        round(avg($"k"), 6).as("avg_k"))
      .orderBy($"event_type")
  }

  /** ROLLUP grouping sets with subtotal rows surfaced as 'ALL'. */
  def q21Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n_rows", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  /** Scalar subquery: customers above the global average balance. */
  def q22AboveAvgCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val avgBal = c.agg(avg($"c_acctbal").as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(avg($"c_acctbal"), 4).as("seg_avg_bal"))
      .orderBy($"c_mktsegment")
  }

  /** Event-time RANGE frame: rolling preceding-hour count and value sum
    * per user — the frame is bounded by event-TIME distance (epoch
    * micros), not row counts, which rows-frames cannot express. The
    * window shuffles once on user_id and sorts within partitions; at
    * 100 TB per-user rolling features are exactly this one-shuffle
    * shape. */
  def q40RollingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600L * 1000000L, 0L)
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", round(sum($"value").over(w), 4))
      .select($"user_id", $"event_id", $"n_1h", $"sum_1h")
      .orderBy($"user_id", $"event_id")
  }

  /** Ranking-function family: ntile quartiles, percent_rank, cume_dist
    * and dense_rank over per-segment account balances — one shuffle on
    * the partition key, like every window query here. */
  def q41RankFamily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    t(s, dir, "customer")
      .filter($"c_custkey" <= 200)
      .select($"c_mktsegment", $"c_custkey",
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** NOT IN subquery — Spark plans this as a null-aware anti join
    * (NAAJ), the one anti-join variant with three-valued-logic
    * semantics: any NULL in the subquery empties the result. The
    * subquery side is a broadcast-size aggregate at any corpus scale. */
  def q42NotIn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").createOrReplaceTempView("q42_orders")
    t(s, dir, "customer").createOrReplaceTempView("q42_customer")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM q42_orders
        |WHERE o_custkey NOT IN (
        |  SELECT c_custkey FROM q42_customer WHERE c_acctbal < 0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** SCD TYPE 2 dimension build (q49): a dated change feed (orders as
    * per-customer attribute changes) becomes validity intervals
    * `[valid_from, valid_to)` — the Kimball dimension-versioning
    * operator downstream of every CDC ingest (the reference's MERGE
    * tables feed exactly this shape). The interval close is `lead()`
    * over the per-key change sequence and `is_current` falls out as
    * lead-IS-NULL, so the whole build is ONE shuffle on the dimension
    * key shared by both window functions and the version numbering —
    * no self-join, no per-row table probe. At 100 TB the key
    * (customer) is high-cardinality, so the exchange is even; ties on
    * the change date are totally ordered by the unique change id,
    * making the versioning deterministic under any input order (the
    * [[graft.streaming.GraftSink.applyLatestBatch]] precondition,
    * applied batch-side). */
  def q49Scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .filter($"o_custkey" % 50 === 0)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead($"o_orderdate", 1).over(w))
      .select($"o_custkey".as("custkey"), $"version",
        $"o_orderpriority".as("priority"),
        $"o_orderdate".cast("string").as("valid_from"),
        $"valid_to_ts".cast("string").as("valid_to"),
        when($"valid_to_ts".isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy($"custkey", $"version")
  }

  /** Cohort retention matrix (q50): users bucketed by first-seen day,
    * activity counted per (cohort, day offset) — the product-analytics
    * complement of the q47 funnel. The first-seen relation is a
    * min-aggregate (partial-combines map-side; never a window over the
    * full event stream), and the join back to events is keyed on
    * user_id — co-partitioned with the aggregate's own exchange, so
    * Catalyst reuses one shuffle layout across first-seen, join, and
    * the per-user distinct. Events only carry (user_id, day) into the
    * exchange: the scan prunes every other column. */
  def q50CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", to_date($"ts").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("cohort_d"))
    ev.join(first, "user_id")
      .groupBy($"cohort_d",
        datediff($"d", $"cohort_d").cast("long").as("offset_days"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select($"cohort_d".cast("string").as("cohort_day"),
        $"offset_days", $"n_users")
      .orderBy($"cohort_day", $"offset_days")
  }

  /** Forward-fill / LOCF gap-filling (q51): a daily per-user series
    * densified over the full date spine, missing days carrying the
    * last observation forward — the time-series preparation step
    * (feature tables, billing snapshots) SQL engines spell as
    * `last_value IGNORE NULLS` over a generated calendar. Per-day
    * winner among same-day events is max(ts, event_id) — a struct-max
    * AGGREGATE; the LOCF window rides the (user, day) spine, whose
    * row count is users × days, not events. Values are integer cents
    * (fixed-point contract). At 100 TB the spine join and the window
    * both shuffle by user_id once — Catalyst shares the exchange. */
  def q51ForwardFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").filter($"user_id" < 20)
      .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
    val daily = ev.groupBy($"user_id", $"day")
      .agg(max(struct($"ts", $"event_id", $"cents")).as("m"))
      .select($"user_id", $"day", $"m.cents".as("obs_cents"))
    val bounds = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val spine = ev.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("carried", last($"obs_cents", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"),
        count($"obs_cents").as("n_obs_days"),
        (count($"carried") - count($"obs_cents")).as("n_filled_days"),
        sum($"carried").as("carried_total_cents"))
      .orderBy($"user_id")
  }

  private val FunnelStages = Seq("view", "click", "purchase")

  /** STAGE-CONVERSION FUNNEL (q52): how many users complete
    * view → click → purchase in strict timestamp order — the second
    * of the two standard funnel formulations (q47 reports per-cohort
    * via composed forward AS-OF joins; q52 is the AGGREGATE-ONLY
    * formulation producing the per-stage conversion report, with no
    * as-of machinery at all — the shape to reach for when the engine
    * at hand has hash aggregation and equi-joins and nothing else).
    * Stage k's entry time is the user's EARLIEST stage-k event strictly
    * later than their stage-(k-1) entry time AND within the 1-day
    * per-step conversion window of it — earliest-entry semantics with a
    * step deadline (both are load-bearing, mirrored in the oracle),
    * deterministic without tie-breaks because each stage time is a min.
    *
    * Scale shape: NO per-user event-list materialization and no window
    * — stage k is one conditional min-aggregate per user co-partitioned
    * with a key-equi join against stage k-1's (user, ts) rows, all on
    * the user_id key, so the events table shuffles once per stage and
    * the join side is one row per surviving user (shrinking every
    * stage). At 100 TB the funnel is K hash-aggregates over an
    * ever-smaller keyed relation — never a sort or a sessionized scan.
    * Output: one row per stage with entrants and conversion from stage
    * one, in basis points (integral — nothing floats). */
  def q52Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
    // stage 1: earliest 'view' per user
    var stage = ev.filter($"event_type" === FunnelStages.head)
      .groupBy($"user_id").agg(min($"ts").as("entered"))
    val counts = Seq.newBuilder[DataFrame]
    counts += stage.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit(FunnelStages.head).as("event_type"),
        $"n_users")
    FunnelStages.zipWithIndex.drop(1).foreach { case (et, i) =>
      stage = ev.filter($"event_type" === et)
        .join(stage.select($"user_id", $"entered".as("prev")), "user_id")
        .filter($"ts" > $"prev" && $"ts" <= $"prev" + expr("INTERVAL 1 DAY"))
        .groupBy($"user_id").agg(min($"ts").as("entered"))
      counts += stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(et).as("event_type"), $"n_users")
    }
    val top = counts.result().reduce(_ unionByName _)
    val first = top.filter($"stage" === 1).select($"n_users".as("n_first"))
    top.crossJoin(broadcast(first))
      // degenerate corpus (zero 'view' events → n_first = 0): define
      // conversion as 0 bp on BOTH engines — Spark's `div` would yield
      // NULL while DuckDB's `//` errors, so the engines would diverge
      .withColumn("conversion_bp", expr(
        "case when n_first > 0 then n_users * 10000 div n_first " +
          "else 0 end"))
      .select($"stage", $"event_type", $"n_users", $"conversion_bp")
      .orderBy($"stage")
  }

  /** GAPS-AND-ISLANDS / LONGEST RUN (q53): per user, the longest
    * strictly-increasing run of purchase values in event order — the
    * sequence-pattern analytics shape (MATCH_RECOGNIZE's bread and
    * butter) expressed with the classic two-window gaps-and-islands
    * identity: flag a break wherever value <= previous value, the
    * running sum of breaks names each run, and run lengths reduce by
    * aggregation. Event order is the (ts, event_id) total order, so
    * both engines see identical runs.
    *
    * Scale shape: ONE shuffle of the purchases by user_id — the lag
    * window, the running-sum window, and the run-length aggregate all
    * ride the same user-keyed exchange (Catalyst reuses it), and the
    * output is one row per user. No self-join, no per-user list. */
  def q53LongestRun(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = t(s, dir, "events").filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = p
      .withColumn("brk",
        when(lag($"value", 1).over(ord).isNull ||
          $"value" <= lag($"value", 1).over(ord), 1L).otherwise(0L))
      .withColumn("run_id", sum($"brk").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy($"user_id", $"run_id")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").as("n_purchases"),
        count(lit(1)).as("n_runs"),
        max($"len").as("longest_run"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_longest_run" -> (q53LongestRun _),
    "q52_funnel" -> (q52Funnel _),
    "q51_forward_fill" -> (q51ForwardFill _),
    "q49_scd2" -> (q49Scd2 _),
    "q50_cohort_retention" -> (q50CohortRetention _),
    "q41_rank_family" -> (q41RankFamily _),
    "q42_not_in" -> (q42NotIn _),
    "q40_rolling_window" -> (q40RollingWindow _),
    "q11_top_orders_per_segment" -> (q11TopOrdersPerSegment _),
    "q12_running_total" -> (q12RunningTotal _),
    "q13_event_deltas" -> (q13EventDeltas _),
    "q14_distinct_counts" -> (q14DistinctCounts _),
    "q15_set_ops" -> (q15SetOps _),
    "q16_part_strings" -> (q16PartStrings _),
    "q17_orders_by_month" -> (q17OrdersByMonth _),
    "q18_hourly_events" -> (q18HourlyEvents _),
    "q19_sessions" -> (q19Sessions _),
    "q20_json_events" -> (q20JsonEvents _),
    "q21_rollup" -> (q21Rollup _),
    "q22_above_avg_customers" -> (q22AboveAvgCustomers _),
  )

  val oracles: Map[String, String] = Map(
    "q53_longest_run" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(value) OVER w IS NULL
        |           OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM flagged),
        |lens AS (SELECT user_id, run_id, count(*) AS len
        |         FROM runs GROUP BY user_id, run_id)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_purchases,
        |  count(*) AS n_runs, CAST(max(len) AS BIGINT) AS longest_run
        |FROM lens GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q52_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS entered FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS entered
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.entered
        |    AND e.ts <= s1.entered + INTERVAL 1 DAY
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS entered
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.entered
        |    AND e.ts <= s2.entered + INTERVAL 1 DAY
        |  GROUP BY e.user_id),
        |top AS (
        |  SELECT 1::BIGINT AS stage, 'view' AS event_type,
        |    count(*)::BIGINT AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT stage, event_type, n_users,
        |  CAST(CASE WHEN (SELECT n_users FROM top WHERE stage = 1) > 0
        |    THEN n_users * 10000 //
        |      (SELECT n_users FROM top WHERE stage = 1)
        |    ELSE 0 END AS BIGINT) AS conversion_bp
        |FROM top ORDER BY stage""".stripMargin,
    "q51_forward_fill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 20),
        |daily AS (SELECT user_id, day, cents AS obs_cents FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, day
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM ev) WHERE rn = 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (SELECT u.user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev) u, b),
        |filled AS (SELECT s.user_id, s.day, d.obs_cents,
        |    last_value(d.obs_cents IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |  FROM spine s LEFT JOIN daily d
        |    ON s.user_id = d.user_id AND s.day = d.day)
        |SELECT user_id, count(*) AS n_days, count(obs_cents) AS n_obs_days,
        |  CAST(count(carried) - count(obs_cents) AS BIGINT)
        |    AS n_filled_days,
        |  CAST(sum(carried) AS BIGINT) AS carried_total_cents
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q49_scd2" ->
      """SELECT o_custkey AS custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  o_orderpriority AS priority,
        |  CAST(o_orderdate AS VARCHAR) AS valid_from,
        |  CAST(lead(o_orderdate) OVER w AS VARCHAR) AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |WHERE o_custkey % 50 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, version""".stripMargin,
    "q50_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |firsts AS (
        |  SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY user_id)
        |SELECT CAST(cohort_d AS VARCHAR) AS cohort_day,
        |  CAST(date_diff('day', cohort_d, d) AS BIGINT) AS offset_days,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN firsts USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_day, offset_days""".stripMargin,
    "q41_rank_family" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q42_not_in" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_custkey NOT IN (
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q40_rolling_window" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 4) AS sum_1h
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q11_top_orders_per_segment" ->
      """SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey,
        |  round(o_totalprice, 2) AS total_price
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) x
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "q12_running_total" ->
      """SELECT user_id, event_id, CAST(ts AS VARCHAR) AS ts_str,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q13_event_deltas" ->
      """SELECT user_id, event_id,
        |  coalesce(date_diff('microsecond',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), -1)
        |    AS delta_us
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,
    "q14_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_set_ops" ->
      """WITH cn AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
        |     sn AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |ORDER BY op, nationkey""".stripMargin,
    "q16_part_strings" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 4) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel
        |FROM part
        |WHERE regexp_matches(p_name, '^(red|blue) ')
        |ORDER BY p_partkey""".stripMargin,
    "q17_orders_by_month" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mon""".stripMargin,
    "q18_hourly_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_str, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin,
    "q19_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WHERE user_id < 50
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(min(ts) AS VARCHAR) AS session_start,
        |  CAST(max(ts) AS VARCHAR) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q20_json_events" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q21_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q22_above_avg_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(avg(c_acctbal), 4) AS seg_avg_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
