"""Time-series operators: as-of join (the operator Spark lacks as a
built-in, composed from window functions — SURVEY section 2.2 'as-of').

The merge-pattern implementation: instead of a per-row backward probe
(quadratic), union both sides tagged, sort within each key by event
time, and carry the last left-side value forward with
last(ignorenulls) — one shuffle on the key, linear scan per key.
At 100 TB this is the only shape that works: the naive
"join on l.ts <= r.ts then max" explodes quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables


@query(
    "asof_join_events",
    oracle="""
    SELECT event_id AS purchase_id, user_id,
           last_value(CASE WHEN event_type = 'click' THEN event_id END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_click_id
    FROM events
    QUALIFY event_type = 'purchase'
    """,
    tags=("timeseries", "asof", "window"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join within the event stream: for every
    purchase, the most recent prior click by the same user.

    Single-table form of the merge pattern; the two-table form is
    identical after a tagged unionByName. Null when no prior click.
    """
    (e,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    carried = e.select(
        "event_id", "user_id", "event_type",
        F.last(F.when(F.col("event_type") == "click", F.col("event_id")),
               ignorenulls=True).over(w).alias("last_click_id"))
    return (carried.where(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id",
                    "last_click_id"))


@query(
    "asof_join_two_tables",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value, 0 AS is_right FROM events
      WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, value, 1 AS is_right FROM events
      WHERE event_type = 'error'),
    carried AS (
      SELECT user_id, ts, event_id, is_right,
             last_value(CASE WHEN is_right = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_right, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_click_id
      FROM tagged)
    SELECT event_id AS error_id, user_id, asof_click_id
    FROM carried WHERE is_right = 1
    """,
    tags=("timeseries", "asof", "window"),
)
def asof_join_two_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-'table' as-of join via tagged union + merge scan: each error
    event picks up the latest click at-or-before it (inclusive; left
    rows sort before right rows at equal timestamps via the tag).
    This is the general recipe for quotes-vs-trades style as-of joins.
    """
    (e,) = tables(spark, sf_dir, "events")
    left = (e.where(F.col("event_type") == "click")
            .select("user_id", "ts", "event_id", "value",
                    F.lit(0).alias("is_right")))
    right = (e.where(F.col("event_type") == "error")
             .select("user_id", "ts", "event_id", "value",
                     F.lit(1).alias("is_right")))
    tagged = left.unionByName(right)
    w = (Window.partitionBy("user_id").orderBy("ts", "is_right", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.select(
        "user_id", "event_id", "is_right",
        F.last(F.when(F.col("is_right") == 0, F.col("event_id")),
               ignorenulls=True).over(w).alias("asof_click_id"))
    return (carried.where(F.col("is_right") == 1)
            .select(F.col("event_id").alias("error_id"), "user_id",
                    "asof_click_id"))


@query(
    "ts_gapfill_ffill",
    oracle="""
    WITH per AS (SELECT user_id, cast(floor(epoch(ts) / 3600) as bigint) AS h,
                   cast(sum(cast(value as decimal(30,8))) as double) AS v,
                   count(*) AS n
            FROM events WHERE user_id < 10 GROUP BY 1, 2),
    span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM per GROUP BY 1),
    grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM span)
    SELECT g.user_id, g.h, coalesce(p.n, 0) AS n_events,
           last_value(p.v IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid g LEFT JOIN per p USING (user_id, h)
    """,
    tags=("timeseries", "gapfill"),
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill — the hypertable-rollup /
    gap-fill operator of time-series engines, composed from Spark
    built-ins: a PER-USER hour grid (sequence(min_h, max_h) exploded
    from each user's own active span), left join of per-hour
    aggregates, last(ignorenulls) carry-forward.

    At 100 TB: the grid is built per user from that user's first/last
    active hour — no global hours x all-users cross join, no broadcast
    of an unbounded distinct-user set, and a user active for one hour
    contributes one grid row instead of |global hours|. The event
    aggregation is partial before its one shuffle on (user_id, h); the
    span aggregate and the fill window reuse the same user_id
    partitioning. Every grid row at or after the user's first event
    has a fill source, so v_filled is never null.
    """
    (ev,) = tables(spark, sf_dir, "events")
    sel = ev.where(F.col("user_id") < 10)
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    per = (sel.groupBy("user_id", hour.alias("h"))
           .agg(F.expr("cast(sum(cast(value as decimal(30,8))) as double)").alias("v"),
                F.count("*").alias("n")))
    span = per.groupBy("user_id").agg(F.min("h").alias("h0"),
                                      F.max("h").alias("h1"))
    grid = span.select("user_id",
                       F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    w = (Window.partitionBy("user_id").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(per, ["user_id", "h"], "left")
            .select("user_id", "h",
                    F.coalesce("n", F.lit(0)).alias("n_events"),
                    F.last("v", ignorenulls=True).over(w).alias("v_filled")))


@query(
    "funnel_click_to_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click' THEN ts END)    AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           count(first_click) AS n_clicked,
           cast(sum(CASE WHEN first_purchase > first_click
                    AND first_purchase <= first_click + INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) as bigint) AS n_converted_7d
    FROM firsts
    """,
    tags=("timeseries", "funnel", "agg"),
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users whose first purchase lands within 7 days
    of their first click. One conditional-min aggregation per user
    (single shuffle), then a scalar rollup — no self-join, no window.
    The shape that replaces per-user event-sequence scans at scale."""
    (ev,) = tables(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
         .alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
         .alias("first_purchase"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("first_click").alias("n_clicked"),
        F.sum(F.when((F.col("first_purchase") > F.col("first_click"))
                     & (F.col("first_purchase")
                        <= F.col("first_click") + F.expr("INTERVAL 7 DAY")), 1)
              .otherwise(0)).alias("n_converted_7d"))


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             cast(floor(epoch(ts) / 604800) as bigint) AS week
      FROM events GROUP BY 1, 2),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
    SELECT c.cohort_week, wk.week - c.cohort_week AS weeks_since,
           count(DISTINCT wk.user_id) AS active_users
    FROM wk JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, weeks_since
    """,
    tags=("timeseries", "cohort", "agg"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted per week-offset.

    Single-scan plan: the naive shape (and the oracle's spelling)
    computes distinct (user, week) twice — once for the cohort-week
    aggregate, once for the join probe — which is two full scans of
    events. Here cohort_week = min(week) OVER (PARTITION BY user_id)
    on the distinct pairs, so events is read ONCE and everything after
    operates on the tiny (user, week) set; no self-join at all."""
    (ev,) = tables(spark, sf_dir, "events")
    wk = (ev.select("user_id",
                    F.floor(F.unix_timestamp("ts") / 604800)
                     .cast("long").alias("week"))
          .distinct())
    w = Window.partitionBy("user_id")
    return (wk.withColumn("cohort_week", F.min("week").over(w))
            .groupBy("cohort_week",
                     (F.col("week") - F.col("cohort_week")).alias("weeks_since"))
            .agg(F.countDistinct("user_id").alias("active_users"))
            .orderBy("cohort_week", "weeks_since"))


@query(
    "asof_join_forward",
    oracle="""
    SELECT event_id AS click_id, user_id,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
             OVER w AS next_purchase_us,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
             OVER w - epoch_us(ts) AS us_to_purchase
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    QUALIFY event_type = 'click'
    """,
    tags=("timeseries", "asof", "window"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the time of the next purchase by
    the same user and the microsecond time-to-conversion (null when the
    user never purchases again). Backward as-of carries the last value;
    forward flips the frame to FOLLOWING and takes min(event time) over
    it — min is order-independent inside the frame, so ties need no
    special casing. One shuffle on user_id, one linear pass."""
    (e,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(1, Window.unboundedFollowing))
    ts_us = F.expr("unix_micros(cast(ts AS timestamp))")
    purchase_us = F.when(F.col("event_type") == "purchase", ts_us)
    carried = e.select(
        "event_id", "user_id", "event_type",
        F.min(purchase_us).over(w).alias("next_purchase_us"),
        (F.min(purchase_us).over(w) - ts_us).alias("us_to_purchase"))
    return (carried.where(F.col("event_type") == "click")
            .select(F.col("event_id").alias("click_id"), "user_id",
                    "next_purchase_us", "us_to_purchase"))


@query(
    "asof_join_nearest",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               OVER wp AS prev_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               OVER wf AS next_us
      FROM events
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id AS click_id, user_id,
           CASE WHEN prev_us IS NULL THEN next_us
                WHEN next_us IS NULL THEN prev_us
                WHEN ts_us - prev_us <= next_us - ts_us THEN prev_us
                ELSE next_us END AS nearest_purchase_us
    FROM c WHERE event_type = 'click'
    """,
    tags=("timeseries", "asof", "window"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (pandas merge_asof direction='nearest'): for every
    click, the closest purchase by the same user in EITHER direction,
    earlier event winning distance ties. Composes the backward frame's
    max and the forward frame's min — still one shuffle on user_id and
    one linear pass; no self-join, no pair explosion at any scale."""
    (e,) = tables(spark, sf_dir, "events")
    wp = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    wf = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing))
    ts_us = F.expr("unix_micros(cast(ts AS timestamp))")
    purchase_us = F.when(F.col("event_type") == "purchase", ts_us)
    c = e.select(
        "event_id", "user_id", "event_type", ts_us.alias("ts_us"),
        F.max(purchase_us).over(wp).alias("prev_us"),
        F.min(purchase_us).over(wf).alias("next_us"))
    nearest = (F.when(F.col("prev_us").isNull(), F.col("next_us"))
               .when(F.col("next_us").isNull(), F.col("prev_us"))
               .when(F.col("ts_us") - F.col("prev_us")
                     <= F.col("next_us") - F.col("ts_us"), F.col("prev_us"))
               .otherwise(F.col("next_us")))
    return (c.where(F.col("event_type") == "click")
            .select(F.col("event_id").alias("click_id"), "user_id",
                    nearest.alias("nearest_purchase_us")))


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH r AS (
      SELECT user_id,
             cast(floor(epoch(ts) / 3600) as bigint) AS h, value,
             row_number() OVER (
               PARTITION BY user_id, cast(floor(epoch(ts) / 3600) as bigint)
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY user_id, cast(floor(epoch(ts) / 3600) as bigint)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT user_id, h,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           cast(count(*) as bigint) AS n_events
    FROM r GROUP BY user_id, h
    """,
    tags=("llm", "timeseries"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the hypertable/financial downsample): per
    (user, hour) bucket emit open (first value by event time), high,
    low, close (last value), and event count. Open/close tie-break on
    (ts, event_id) so duplicate timestamps stay deterministic — the
    detail naive first()/last() aggregates get wrong.

    Plan: ONE exchange on (user_id, hour) serves both row_number
    windows AND the final aggregate (same partitioning expression);
    values pass through untouched (no float arithmetic), so the
    result hashes identically across engines. At 100 TB this is the
    canonical rollup shape: narrow projection, single hash partition,
    map-side-combinable aggregate.
    """
    (e,) = tables(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    d = e.select("user_id", hour.alias("h"), "ts", "event_id", "value")
    wa = Window.partitionBy("user_id", "h").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "h").orderBy(
        F.desc("ts"), F.desc("event_id"))
    ranked = (d.withColumn("rn_a", F.row_number().over(wa))
               .withColumn("rn_d", F.row_number().over(wd)))
    return (ranked.groupBy("user_id", "h").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events")))


@query(
    "ts_anomaly_rolling",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id,
             cast(round(value * 100) AS bigint) AS x,
             count(*) OVER w AS k,
             cast(sum(cast(round(value * 100) AS bigint)) OVER w
                  AS bigint) AS s1,
             cast(sum(cast(round(value * 100) AS bigint)
                      * cast(round(value * 100) AS bigint)) OVER w
                  AS bigint) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, x AS value_e2, s1 AS base_sum
    FROM b
    WHERE k = 7
      AND (7 * x - s1) * (7 * x - s1) > 9 * (7 * s2 - s1 * s1)
    """,
    tags=("timeseries", "anomaly"),
)
def ts_anomaly_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: flag an event whose value
    sits more than 3 sigma from the mean of that user's PREVIOUS 7
    events (a full trailing baseline; partial windows don't fire).

    Determinism: values are 2-decimal, so everything runs in exact e2
    integers — the 3-sigma rule is evaluated as
    ``(k*x - s1)^2 > 9*(k*s2 - s1^2)`` (both sides k^2-scaled), never
    touching float mean/stddev whose summation order differs across
    engines.

    Scale shape: ONE hash exchange on user_id, both running sums ride
    the same sort in a single Window physical operator, and the filter
    is a post-window Project — per-user state is O(window), so a
    1000-executor run is embarrassingly parallel in user_id.
    """
    (e,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-7, -1))
    x = F.round(F.col("value") * 100).cast("long")
    b = e.select(
        "event_id", "user_id", x.alias("x"),
        F.count("*").over(w).alias("k"),
        F.sum(x).over(w).alias("s1"),
        F.sum(x * x).over(w).alias("s2"),
    )
    lhs = (F.lit(7) * F.col("x") - F.col("s1"))
    rhs = F.lit(9) * (F.lit(7) * F.col("s2") - F.col("s1") * F.col("s1"))
    return (b.where((F.col("k") == 7) & (lhs * lhs > rhs))
             .select("event_id", "user_id",
                     F.col("x").alias("value_e2"),
                     F.col("s1").alias("base_sum")))
