"""Event-time windowing operators (SURVEY section 2.2 'Streaming
windows' row — absent in the reference, which is processing-time only;
README.md:54-56).

Spark's window()/session_window() work identically in batch and
Structured Streaming — these queries exercise the batch side against
the DuckDB oracle; tests/test_streaming_windows.py runs the same
operators through readStream+watermark to prove the streaming path.

Cross-engine care: window boundaries compared on whole-second epochs;
timestamps formatted to microsecond strings; sliding windows
enumerated identically (one row per covering window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "evt_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}') AS win_start,
           event_type,
           count(*) AS n,
           cast(sum(cast(value as decimal(30,8))) as double) AS total_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
    tags=("event_time", "window"),
)
def evt_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows (streaming: same expression
    after withWatermark; see test_streaming_windows)."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.expr("cast(sum(cast(value as decimal(30,8))) as double)")
              .alias("total_value"))
        .select(F.date_format("w.start", _TS_FMT_SPARK).alias("win_start"),
                "event_type", "n", "total_value")
    )


@query(
    "evt_sliding_window",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts) - (k.k * INTERVAL 1 DAY),
                    '{_TS_FMT_DUCK}') AS win_start,
           count(*) AS n
    FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
    GROUP BY 1
    """,
    tags=("event_time", "window"),
)
def evt_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 2-day length, 1-day slide — every event lands in
    exactly two windows (enumerated identically in the oracle)."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", _TS_FMT_SPARK).alias("win_start"), "n")
    )


@query(
    "evt_session_window",
    oracle="""
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR extract(epoch FROM ts) - extract(epoch FROM lag(ts) OVER w)
                          > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM x)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
           count(*) AS n_events
    FROM s GROUP BY user_id, sess_seq
    """,
    tags=("event_time", "session"),
)
def evt_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via the built-in
    session_window — the streaming-stateful operator run in batch.
    Oracle reproduces the merge rule (new session iff gap STRICTLY
    exceeds 30 min — session_window's per-event interval is
    [ts, ts+gap] for merging, so an event landing exactly on the
    boundary still extends the session; registry-fuzz finding)
    with gaps-and-islands SQL."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                 .alias("sess_start"),
                "n_events")
    )


@query(
    "evt_dedup_by_key",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    tags=("event_time", "dedup"),
)
def evt_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup (first event per (user, type) in event-time order) —
    the deterministic batch analogue of streaming dropDuplicates
    (which keeps an arbitrary row; a total order makes it testable)."""
    from pyspark.sql import Window
    (e,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (e.select("user_id", "event_type", "event_id",
                     F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type",
                    F.col("event_id").alias("first_event_id")))
