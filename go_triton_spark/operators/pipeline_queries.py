"""Batch-expressible pipeline operators (SURVEY section 2.1) over events.

The reference's replay/monitoring surface, re-expressed as queries the
oracle can check:

- S12 date-range partition enumeration  -> ts-range filter + agg
- S13 prefix filter (S3 name pushdown)  -> LIKE-prefix filter
- S15/S16 manifest-ordered serial read  -> total-ordered replay project
- S17 projection to JSON                -> deterministic JSON encode
- S18 checkpoint-age aggregation        -> per-key age vs a fixed 'now'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

_NOW = "2024-02-01 00:00:00"  # fixed 'now' so S18 ages are deterministic


@query(
    "s12_date_range_replay",
    fuzz_exclusion="builds its own temp-archive lifecycle; covered by the archive soak/fuzz suites (test_archive*, test_streaming*)",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
           cast(sum(cast(value as decimal(30,8))) as double) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    GROUP BY strftime(ts, '%Y-%m-%d'), event_type
    """,
    tags=("pipeline", "s12"),
)
def s12_date_range_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 (triton/store_reader.go:13-29): replay a [start,end) day range.
    On the archive table this predicate prunes date partitions; here it
    pushes down to the parquet scan."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        e.where((F.col("ts") >= F.lit("2024-01-08").cast("timestamp_ntz"))
                & (F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(F.count("*").alias("n"),
             F.expr("cast(sum(cast(value as decimal(30,8))) as double)").alias("total_value"))
    )


@query(
    "s13_prefix_filter",
    fuzz_exclusion="archive-layer query over a temp archive; covered by the archive soak/fuzz suites, not corpus-shape fuzzing",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events WHERE event_type LIKE 'c%'
    """,
    tags=("pipeline", "s13"),
)
def s13_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 (triton/store_reader.go:58-88): prefix filtering, the S3
    list-prefix pushdown re-expressed as a StartsWith predicate (shows
    up in PushedFilters on the scan)."""
    (e,) = tables(spark, sf_dir, "events")
    return (e.where(F.col("event_type").startswith("c"))
            .select("event_id", "event_type", "user_id"))


@query(
    "s15_ordered_replay",
    fuzz_exclusion="ordered replay over a temp archive; ordering contract fuzzed by the archive lifecycle tests instead",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s, event_type,
           row_number() OVER (ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
                              event_id) AS replay_seq
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03'
    """,
    tags=("pipeline", "s15"),
)
def s15_ordered_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15/S16 (triton/store_reader.go:36-52, reader.go:13-38): strict
    replay order as an explicit total order + global sequence number —
    WITHOUT a single-partition global window. Two-phase rank: (1)
    row_number within each day partition (parallel, one task per day,
    matching the archive layout's date partitioning — use (date, hour)
    at production granularity), (2) a cumulative count over the tiny
    per-day totals (rows = number of days, broadcast back). The sum of
    the two is the same global replay_seq a total-order window would
    produce, at shuffle-on-day parallelism."""
    (e,) = tables(spark, sf_dir, "events")
    from pyspark.sql import Window
    sel = (e.where(F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
           .withColumn("day", F.to_date("ts")))
    wd = Window.partitionBy("day").orderBy("ts", "event_id")
    ranked = sel.withColumn("rn", F.row_number().over(wd))
    wcum = (Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (sel.groupBy("day").count()
               .withColumn("off", F.coalesce(F.sum("count").over(wcum),
                                             F.lit(0))))
    return (ranked.join(F.broadcast(offsets.select("day", "off")), "day")
            .select("event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
                    "event_type",
                    (F.col("off") + F.col("rn")).alias("replay_seq")))


@query(
    "s17_json_projection",
    oracle="""
    SELECT printf('{"event_id":%d,"event_type":"%s","user_id":%d}',
                  event_id, event_type, user_id) AS json
    FROM events WHERE event_id < 100
    """,
    tags=("pipeline", "s17"),
)
def s17_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17 (triton.go:351-366): record -> JSON line. Deterministic
    template (printf/format_string) so both engines emit identical
    bytes; the engine's own cat_json uses to_json."""
    (e,) = tables(spark, sf_dir, "events")
    return (e.where(F.col("event_id") < 100)
            .select(F.format_string('{"event_id":%d,"event_type":"%s","user_id":%d}',
                                    "event_id", "event_type", "user_id").alias("json")))


_NOW_EPOCH = 1706745600  # 2024-02-01 00:00:00 UTC


@query(
    "s18_checkpoint_age",
    fuzz_exclusion="reads streaming checkpoint state, not a data corpus; covered by the checkpoint/restart tests",
    oracle=f"""
    SELECT event_type AS shard,
           {_NOW_EPOCH} - cast(floor(extract(epoch FROM max(ts))) as bigint)
               AS age_seconds,
           count(*) AS records
    FROM events
    GROUP BY event_type
    """,
    tags=("pipeline", "s18"),
)
def s18_checkpoint_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 (triton/checkpoint.go:127-151): age = now - last update per
    shard-like key, against a fixed 'now' epoch for determinism.
    (Whole-second epochs on both sides: boundary-crossing vs duration
    semantics of the engines' native diff functions disagree.)"""
    (e,) = tables(spark, sf_dir, "events")
    return (e.groupBy(F.col("event_type").alias("shard"))
            .agg((F.lit(_NOW_EPOCH)
                  - F.max("ts").cast("timestamp").cast("long")).alias("age_seconds"),
                 F.count("*").alias("records")))
