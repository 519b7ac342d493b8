package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QFn
import graft.tables.Tables

/** SURVEY.md §2 extension — temporal operators Spark has no built-in for:
  * as-of join, range join, sessionization. The reference's event-funnel
  * analytics (README.md:90-102) stop at per-type counts; these are the
  * standard next questions an event warehouse answers ("what was the last
  * purchase before this click", "which value band", "how long are
  * sessions"), each built in the shape that survives 100 TB.
  */
object Temporal {

  /** As-of join: every click event matched to the SAME USER's most recent
    * purchase event at-or-before it (trade/quote semantics).
    *
    * Spark-first shape: NOT a per-row range probe — tag both streams,
    * union, and carry the last purchase forward with a window running over
    * (ts, is_quote DESC), i.e. ONE hash shuffle on user_id and a per-user
    * sort, no join node at all. This is the linear-cost as-of shape that
    * holds at any scale; an actual range join here would be O(clicks ×
    * purchases) per user.
    *
    * Determinism: purchases are first deduped to one row per (user_id, ts)
    * keeping the max event_id, so "the most recent purchase" is unique even
    * with timestamp collisions (the DuckDB ASOF JOIN oracle would otherwise
    * be ambiguous). */
  val joinAsofPurchase: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), lit(1).as("is_q"),
        col("event_id").as("p_event_id"), col("value").as("p_value"),
        lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("is_q"),
        lit(null).cast("long").as("p_event_id"),
        lit(null).cast("double").as("p_value"), col("event_id"))
    // at equal ts the purchase sorts first (is_q DESC), so ts >= semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_q") === 0)
      .select("event_id", "user_id", "ts", "last_purchase_id", "last_purchase_value")
      .orderBy("event_id")
  }

  /** As-of join with a STALENESS TOLERANCE — the form production as-of
    * consumers actually need (feature stores with TTL, trade/quote with a
    * max-staleness cutoff): each click matches the same user's most
    * recent purchase at-or-before it, but only if that purchase is at
    * most 48 h old; staler matches are dropped (inner-with-tolerance
    * semantics). Same single-shuffle union-tag + last(ignoreNulls)
    * window plan as [[joinAsofPurchase]] — the tolerance is a residual
    * filter AFTER match resolution, no extra exchange — and in the
    * streaming rendering the same bound is what lets watermark state be
    * pruned. Staleness emitted as exact integer µs (unix_micros
    * difference) so the oracle comparison is integral. */
  val ToleranceUs: Long = 48L * 3600 * 1000000

  val joinAsofTolerance: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), lit(1).as("is_q"),
        col("event_id").as("p_event_id"), col("value").as("p_value"),
        col("ts").as("p_ts"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("is_q"),
        lit(null).cast("long").as("p_event_id"),
        lit(null).cast("double").as("p_value"),
        lit(null).cast("timestamp").as("p_ts"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("is_q") === 0 && col("last_purchase_id").isNotNull)
      .withColumn("staleness_us",
        unix_micros(col("ts")) - unix_micros(col("last_purchase_ts")))
      .filter(col("staleness_us") <= ToleranceUs)
      .select("event_id", "user_id", "ts", "last_purchase_id",
        "last_purchase_value", "staleness_us")
      .orderBy("event_id")
  }

  /** Value bands for the range join — shared between the Spark plan and
    * the DuckDB oracle so they cannot drift. [lo, hi) half-open,
    * non-overlapping, covering the full events.value range. */
  val bands: Seq[(String, Double, Double)] = Seq(
    ("p_micro", 0.0, 1.0),
    ("q_small", 1.0, 5.0),
    ("r_mid", 5.0, 20.0),
    ("s_large", 20.0, 100.0),
    ("t_huge", 100.0, 1000.0))

  /** Range join: events classified into irregular value bands via a
    * non-equi join, then aggregated per band.
    *
    * The band table is bounded (a handful of rows), so the right plan IS
    * the broadcast nested-loop — each event row scans 5 broadcast rows,
    * linear in events, zero shuffle for the join itself. For range tables
    * too big to broadcast, the scale shape is bucket expansion: explode
    * each range into fixed-width buckets, equi-join on bucket, re-filter —
    * same output, shuffle instead of nested loop. Sum runs over
    * decimal(18,4) (order-independent), cast back for the oracle hash. */
  val joinRangeBands: QFn = (spark, sfDir) => {
    val b = spark.createDataFrame(bands).toDF("band", "lo", "hi")
    Tables(spark, sfDir, "events")
      .join(broadcast(b), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band", "lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy("lo")
  }

  /** Sessionization: per-user sessions split at >30 min inactivity gaps —
    * lag to detect boundaries, running sum to number sessions, then one
    * aggregate per session. Two window passes + one aggregate over the
    * SAME user_id partitioning, so Spark plans a single shuffle and reuses
    * the sort — the standard linear sessionize. */
  val windowSessionize: QFn = (spark, sfDir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, sfDir, "events")
      // exact integer microseconds on BOTH sides (unix_micros / epoch_us):
      // second-truncated casts disagree with fractional epochs on gaps
      // that straddle the 30-minute boundary
      .withColumn("new_sess",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          > 30L * 60 * 1000000 || lag(col("ts"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Engine-native sessionization via the built-in `session_window` — the
    * complement to `window_sessionize`'s manual lag/running-sum spelling
    * (the same pairing as AQE skew-join vs manual salting): one grouped
    * aggregate, Spark's SessionWindowing rule handles the merge, and the
    * IDENTICAL operator works under Structured Streaming with state
    * eviction for free. Semantics differ from the manual spelling at the
    * boundary — a session's window is [first_ts, last_ts + gap), and an
    * event at EXACTLY prev_ts + 30 min starts a new session (>= where the
    * manual one breaks on >) — which is why both operators exist and each
    * has its own exact oracle. */
  val windowSessionNative: QFn = (spark, sfDir) =>
    Tables(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Time-series densification (gap fill): each customer's Q1-1995 order
    * activity becomes a CONTINUOUS daily series — `sequence(min_day,
    * max_day)` + explode generates the calendar between that customer's
    * first and last order, a left join back fills quiet days with 0. The
    * standard prep for per-entity trend charts and forecasting inputs,
    * which can't tolerate missing days. Scale: the explode factor is
    * bounded by the window span (≤ 90 rows/customer here — a fixed
    * analysis window is what makes gap fill safe at 100 TB; an unbounded
    * span would let one ancient customer explode into decades), and both
    * the daily counts and the spans aggregate from one filtered scan with
    * the date predicate pushed to parquet. */
  val fnDateGapfill: QFn = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01")
        && col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
    val daily = o.groupBy("o_custkey", "day").agg(count(lit(1)).as("n_orders"))
    val span = o.groupBy("o_custkey").agg(min("day").as("d0"), max("day").as("d1"))
    span
      .select(col("o_custkey"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .join(daily, Seq("o_custkey", "day"), "left")
      .select(col("o_custkey"), col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("o_custkey", "day")
  }

  /** Interval-overlap join: per-user activity sessions (30-min-gap, the
    * same boundaries as `window_sessionize`) matched against promo windows
    * (two 4-hour promos per active day, 10:00 and 18:00) — "which sessions
    * were live during each promotion, and for how long".
    *
    * Spark has no native interval join; the naive spelling is a range-
    * predicate join that plans as a nested loop, O(sessions × promos). The
    * scale shape used here is GRID BUCKETING: explode each session onto the
    * calendar days it covers, equi-join day-cell against the promo's day,
    * re-check the exact overlap predicate, and dedupe (a session crossing
    * midnight reaches the same promo through at most one cell here, but the
    * dedupe is what makes the pattern correct for intervals and cells of
    * any width). The join is then a plain hash/merge equi-join on the cell
    * key — shuffle-partitionable, no nested loop, and the explode factor is
    * bounded by interval span / cell width (sessions are minutes-to-hours,
    * so ~1). Overlap is computed in exact integer microseconds; closed
    * intervals, so a session touching a promo endpoint counts with 0 µs. */
  val joinIntervalOverlap: QFn = (spark, sfDir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables(spark, sfDir, "events")
      .withColumn("new_sess",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          > 30L * 60 * 1000000 || lag(col("ts"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val promos = Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day")).distinct()
      .select(col("day"), explode(array(lit(10), lit(18))).as("h"))
      .select(
        concat_ws("_", date_format(col("day"), "yyyy-MM-dd"), col("h"))
          .as("promo_id"),
        col("day"),
        expr("timestampadd(HOUR, h, CAST(day AS TIMESTAMP))").as("p_start"),
        expr("timestampadd(HOUR, h + 4, CAST(day AS TIMESTAMP))").as("p_end"))
    sessions
      .select(col("*"),
        explode(expr("sequence(to_date(s_start), to_date(s_end))")).as("cell"))
      .join(promos, col("cell") === col("day")
        && col("s_start") <= col("p_end") && col("p_start") <= col("s_end"))
      .dropDuplicates("user_id", "session_idx", "promo_id")
      .groupBy("promo_id", "p_start")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(unix_micros(least(col("s_end"), col("p_end")))
          - unix_micros(greatest(col("s_start"), col("p_start"))))
          .as("overlap_us"))
      .orderBy("p_start")
  }

  /** Gaps-and-islands: each user's streaks of CONSECUTIVE active days. The
    * classic spelling — distinct (user, day), row_number per user, group by
    * `day - rn` (constant within a run of consecutive days) — is one
    * distinct-shuffle plus one window plus one aggregate, all partitioned
    * by the high-cardinality user_id, so every stage parallelizes across
    * the user space and no task sees more than one user's calendar. The
    * window-free alternative (self-join day = day - 1 iterated) is
    * O(streak-length) joins; this is the linear shape. */
  val windowGapsIslands: QFn = (spark, sfDir) => {
    Tables(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", expr("date_sub(day, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day))"))
      .groupBy("user_id", "grp")
      .agg(min(col("day")).as("streak_start"), max(col("day")).as("streak_end"),
        count(lit(1)).as("len_days"))
      .select("user_id", "streak_start", "streak_end", "len_days")
      .orderBy("user_id", "streak_start")
  }

  /** Time-to-convert funnel lag (README.md:99-102's funnel, with the WHEN
    * added): per user, first view → first purchase at-or-after it; the
    * per-segment report is converter counts + p50/p90 lag. Lags are EXACT
    * integer microseconds (unix_micros difference — no float time math),
    * so the only doubles are the final interpolated percentiles, computed
    * by the same linear rule in Spark (`percentile`) and DuckDB
    * (`quantile_cont`). Two first-event aggregates (map-side combined) +
    * one broadcast dim join; the percentile shuffle carries one lag per
    * converter, grouped 5 ways. */
  val aggConversionLag: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("first_view"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .groupBy("user_id").agg(min(col("ts")).as("first_buy"),
        first(col("first_view")).as("fv"))
    val cust = Tables(spark, sfDir, "customer")
    firstBuy
      .withColumn("lag_us", unix_micros(col("first_buy")) - unix_micros(col("fv")))
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lag_us, 0.5)") / 1e6, 3).as("p50_lag_s"),
        round(expr("percentile(lag_us, 0.9)") / 1e6, 3).as("p90_lag_s"))
      .orderBy("c_mktsegment")
  }

  /** Daily OHLC resample of the event value stream — the time-series
    * downsampling every monitoring/finance dashboard runs (open/high/low/
    * close + volume per calendar day). ONE hash aggregate: open and close
    * are min/max over (ts, event_id, value) structs — Spark orders
    * structs lexicographically, so the whole-row min IS "value at the
    * earliest (ts, event_id)" with a deterministic unique-key tie-break,
    * no window sort, no second pass (the same whole-row-min idiom as
    * agg_funnel_ordered). Output is calendar-bounded (one row per day),
    * shuffle carries 2 structs + 2 doubles + a count per day — linear
    * scan, constant state, any corpus size. DuckDB mirrors with
    * min/max over struct_pack, so the full oracle hash-matches. */
  val windowResampleOhlc: QFn = (spark, sfDir) => {
    val key = struct(col("ts"), col("event_id"), col("value"))
    Tables(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        min(key).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(key).getField("value").as("close"))
      .orderBy("day")
  }

  /** FORWARD as-of join — the other direction (pandas merge_asof
    * direction='forward', kdb aj reversed): for each click, the FIRST
    * purchase at-or-after it — "time to next conversion", where the
    * backward twin answers "how stale is the last one". Same union +
    * single-keyed-window shape as [[joinAsofPurchase]] with the scan
    * reversed (ts DESC carries the nearest LATER purchase backward onto
    * each click); same-ts purchase counts as 'at' on both engines
    * (is_q DESC under ts DESC ↔ the oracle's <=). One user_id shuffle,
    * no range join, no per-row subquery — linear at any corpus size. */
  val joinAsofForward: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), lit(1).as("is_q"),
        col("event_id").as("p_event_id"), col("value").as("p_value"),
        lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("is_q"),
        lit(null).cast("long").as("p_event_id"),
        lit(null).cast("double").as("p_value"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("is_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("next_purchase_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("next_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_q") === 0)
      .select("event_id", "user_id", "ts", "next_purchase_id", "next_purchase_value")
      .orderBy("event_id")
  }

  val queries: Map[String, QFn] = Map(
    "join_asof_forward" -> joinAsofForward,
    "window_resample_ohlc" -> windowResampleOhlc,
    "agg_conversion_lag" -> aggConversionLag,
    "fn_date_gapfill" -> fnDateGapfill,
    "join_asof_purchase" -> joinAsofPurchase,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_interval_overlap" -> joinIntervalOverlap,
    "join_range_bands" -> joinRangeBands,
    "window_gaps_islands" -> windowGapsIslands,
    "window_session_native" -> windowSessionNative,
    "window_sessionize" -> windowSessionize,
  )

  private def bandsSqlDuck: String =
    bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "window_resample_ohlc" ->
      ("SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events, " +
        "(min({'t': ts, 'i': event_id, 'v': value})).v AS open, " +
        "max(value) AS high, min(value) AS low, " +
        "(max({'t': ts, 'i': event_id, 'v': value})).v AS close " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "agg_conversion_lag" ->
      ("WITH fv AS (SELECT user_id, min(ts) AS first_view FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "fb AS (SELECT e.user_id, min(e.ts) AS first_buy, min(fv.first_view) AS fvt " +
        "FROM events e JOIN fv ON e.user_id = fv.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view GROUP BY 1), " +
        "l AS (SELECT user_id, epoch_us(first_buy) - epoch_us(fvt) AS lag_us FROM fb) " +
        "SELECT c_mktsegment, count(*) AS n_converted, " +
        "ROUND(quantile_cont(lag_us, 0.5) / 1e6, 3) AS p50_lag_s, " +
        "ROUND(quantile_cont(lag_us, 0.9) / 1e6, 3) AS p90_lag_s " +
        "FROM l JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),
    "fn_date_gapfill" ->
      ("WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'), " +
        "daily AS (SELECT o_custkey, day, count(*) AS n_orders FROM o GROUP BY 1, 2), " +
        "span AS (SELECT o_custkey, min(day) AS d0, max(day) AS d1 FROM o GROUP BY 1), " +
        "days AS (SELECT o_custkey, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day " +
        "FROM span) " +
        "SELECT days.o_custkey, days.day, coalesce(daily.n_orders, 0) AS n_orders " +
        "FROM days LEFT JOIN daily ON days.o_custkey = daily.o_custkey AND days.day = daily.day " +
        "ORDER BY 1, 2"),
    // DuckDB's native ASOF JOIN is the independent oracle for the
    // union+window implementation; purchases deduped identically first
    "join_asof_forward" ->
      ("WITH p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value, " +
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
        "FROM events WHERE event_type = 'purchase'), " +
        "pd AS (SELECT user_id, ts, p_event_id, p_value FROM p WHERE rn = 1) " +
        "SELECT e.event_id, e.user_id, e.ts, pd.p_event_id AS next_purchase_id, " +
        "pd.p_value AS next_purchase_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') e " +
        "ASOF LEFT JOIN pd ON e.user_id = pd.user_id AND e.ts <= pd.ts " +
        "ORDER BY e.event_id"),
    "join_asof_purchase" ->
      ("WITH p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value, " +
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
        "FROM events WHERE event_type = 'purchase'), " +
        "pd AS (SELECT user_id, ts, p_event_id, p_value FROM p WHERE rn = 1) " +
        "SELECT e.event_id, e.user_id, e.ts, pd.p_event_id AS last_purchase_id, " +
        "pd.p_value AS last_purchase_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') e " +
        "ASOF LEFT JOIN pd ON e.user_id = pd.user_id AND e.ts >= pd.ts " +
        "ORDER BY e.event_id"),
    // inner ASOF + the staleness residual; integer-µs staleness so the
    // tolerance comparison is integral on both engines
    "join_asof_tolerance" ->
      ("WITH p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value, " +
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
        "FROM events WHERE event_type = 'purchase'), " +
        "pd AS (SELECT user_id, ts, p_event_id, p_value FROM p WHERE rn = 1) " +
        "SELECT e.event_id, e.user_id, e.ts, pd.p_event_id AS last_purchase_id, " +
        "pd.p_value AS last_purchase_value, " +
        "epoch_us(e.ts) - epoch_us(pd.ts) AS staleness_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') e " +
        "ASOF JOIN pd ON e.user_id = pd.user_id AND e.ts >= pd.ts " +
        s"WHERE epoch_us(e.ts) - epoch_us(pd.ts) <= $ToleranceUs " +
        "ORDER BY e.event_id"),
    // independent spelling: DuckDB joins on the RAW overlap predicate (no
    // grid cells), so the bucketing rewrite is checked against the direct
    // range join it replaces
    "join_interval_overlap" ->
      ("WITH g AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM g), " +
        "sess AS (SELECT user_id, session_idx, min(ts) AS s_start, max(ts) AS s_end " +
        "FROM s GROUP BY 1, 2), " +
        "promos AS (SELECT strftime(day, '%Y-%m-%d') || '_' || CAST(h AS VARCHAR) AS promo_id, " +
        "CAST(day AS TIMESTAMP) + h * INTERVAL 1 HOUR AS p_start, " +
        "CAST(day AS TIMESTAMP) + (h + 4) * INTERVAL 1 HOUR AS p_end " +
        "FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events), (VALUES (10), (18)) t(h)) " +
        "SELECT promo_id, p_start, count(*) AS n_sessions, " +
        "count(DISTINCT user_id) AS n_users, " +
        "CAST(sum(epoch_us(least(s_end, p_end)) - epoch_us(greatest(s_start, p_start))) AS BIGINT) AS overlap_us " +
        "FROM sess JOIN promos ON s_start <= p_end AND p_start <= s_end " +
        "GROUP BY 1, 2 ORDER BY p_start"),
    "window_gaps_islands" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "r AS (SELECT user_id, day, day - CAST(row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp FROM a) " +
        "SELECT user_id, min(day) AS streak_start, max(day) AS streak_end, " +
        "count(*) AS len_days FROM r GROUP BY user_id, grp " +
        "ORDER BY user_id, streak_start"),
    // lo/hi cast to DOUBLE: DuckDB types VALUES literals as DECIMAL,
    // which would hash-mismatch Spark's double band columns
    "join_range_bands" ->
      (s"SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi, count(*) AS n_events, " +
        "ROUND(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value " +
        s"FROM events JOIN (VALUES $bandsSqlDuck) b(band, lo, hi) " +
        "ON value >= lo AND value < hi GROUP BY 1, 2, 3 ORDER BY lo"),
    // session_window boundary is >= (an event at exactly last_ts + gap
    // opens a NEW session) and session_end = last_ts + gap — both replayed
    // exactly
    "window_session_native" ->
      ("WITH g AS (SELECT user_id, ts, value, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM g) " +
        "SELECT user_id, min(ts) AS session_start, " +
        "max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events, " +
        "ROUND(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value " +
        "FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_start"),
    "window_sessionize" ->
      ("WITH g AS (SELECT user_id, ts, event_id, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM g) " +
        "SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events, " +
        "ROUND(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"),
  )
}
