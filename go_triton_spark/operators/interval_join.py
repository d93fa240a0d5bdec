"""Bucketed interval join: the scale path for point-in-interval and
interval-overlap joins.

A naive interval join (``p.ts BETWEEN i.start AND i.end``) has no
equi-key, so Spark executes it as a (broadcast) nested-loop join —
O(|points| x |intervals|) comparisons, which is fine for a 5-row band
table (join_range) and fatal for millions of intervals.  The classic
fix: quantize time into fixed buckets, explode each interval over the
buckets it spans, and equi-join on the bucket with the exact predicate
as a residual filter.  Comparisons drop to O(points + interval-spans +
true-ish matches); the join is a plain hash/SMJ shuffle on the bucket
key (AQE-managed), not a nested loop.

Used as a library utility (`bucketed_interval_join`) and exposed as the
oracle-checked ``interval_join_sessions`` query below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables


def bucketed_interval_join(points: DataFrame, intervals: DataFrame,
                           point_ts: str, start_ts: str, end_ts: str,
                           bucket_seconds: int = 3600,
                           extra_keys: list[tuple[str, str]] | None = None,
                           how: str = "inner") -> DataFrame:
    """Join points to [start, end) intervals via time-bucket equi-keys.

    ``points``/``intervals`` must not share column names. Each interval
    row is exploded over ceil(span/bucket) buckets; each point maps to
    exactly one bucket. ``extra_keys`` [(point_col, interval_col), ...]
    join INSIDE the equi-key (shuffle partitions by (keys, bucket) —
    essential when many entities share time ranges). The exact
    containment predicate is a residual, so results equal the naive
    theta join (property-tested).
    """
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "_pb", (F.unix_timestamp(F.col(point_ts)) / b).cast("long"))
    i = intervals.withColumn(
        "_ib",
        F.explode(F.sequence(
            (F.unix_timestamp(F.col(start_ts)) / b).cast("long"),
            (F.unix_timestamp(F.col(end_ts)) / b).cast("long"))))
    cond = (F.col("_pb") == F.col("_ib")) \
        & (F.col(point_ts) >= F.col(start_ts)) \
        & (F.col(point_ts) < F.col(end_ts))
    for pk, ik in (extra_keys or []):
        cond = cond & (F.col(pk) == F.col(ik))
    out = p.join(i, cond, how)
    return out.drop("_pb", "_ib")


@query(
    "interval_join_sessions",
    oracle="""
    WITH iv AS (
      SELECT user_id AS iv_user, ts AS iv_start,
             ts + INTERVAL 2 HOUR AS iv_end, event_id AS iv_id
      FROM events WHERE event_type = 'purchase' AND event_id % 7 = 0)
    SELECT e.event_id, iv.iv_id
    FROM events e JOIN iv
      ON e.user_id = iv.iv_user
     AND e.ts >= iv.iv_start AND e.ts < iv.iv_end
    WHERE e.event_type = 'click'
    ORDER BY event_id, iv_id
    """,
    tags=("join", "interval", "timeseries"),
)
def interval_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing inside 2-hour post-purchase windows — an interval
    join executed via time-bucket equi-keys + user key (hash join on
    (user, bucket), never a nested loop; see module docstring)."""
    (ev,) = tables(spark, sf_dir, "events")
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts")))
    iv = (ev.where((F.col("event_type") == "purchase")
                   & (F.col("event_id") % 7 == 0))
          .select(F.col("user_id").alias("iv_user"),
                  F.col("ts").alias("iv_start"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("iv_end"),
                  F.col("event_id").alias("iv_id")))
    joined = bucketed_interval_join(clicks, iv, "c_ts", "iv_start", "iv_end",
                                    bucket_seconds=3600,
                                    extra_keys=[("c_user", "iv_user")])
    return (joined.select("event_id", "iv_id")
            .orderBy("event_id", "iv_id"))
