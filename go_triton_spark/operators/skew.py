"""Skew and co-location utilities for 100 TB joins.

- ``salted_join``: explicit salting for hot keys — replicate the small
  side R ways, scatter the big side's hot keys across R salted
  partitions. AQE's skew-join splitting handles most cases at runtime;
  explicit salting is for the pathological key (one user = 10% of
  events) where even a split partition won't fit.
- ``detect_dominant_key`` / ``skew_aware_join``: the AUTOMATIC route.
  AQE's skew detector reads post-compression shuffle BYTES, so a
  narrow/constant hot key (column-pruned count(*): 1M-row partition =
  399 KB vs 186 KB median, measured in tools/skew_experiment.py) sails
  under every byte threshold while one task executes half the probes.
  The guard probes the big side's key distribution with a bounded
  per-partition head sample at plan-build and routes to
  ``salted_join`` when one key dominates — the round-5 SCALE.md
  routing rule as code instead of documentation.
- ``write_bucketed`` / co-located joins: pre-shuffle once at write
  time (bucketBy on the join key); subsequent joins between tables
  bucketed the same way run shuffle-free (verified by plan test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with key salting.

    big gets a random-but-deterministic salt (hash of all columns mod
    R); small is exploded R ways. Join key becomes (key, salt) — a hot
    key's rows spread over R reducers instead of one.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt_buckets - 1})")))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def detect_dominant_key(df: DataFrame, key: str,
                        rows_per_partition: int = 1000) -> dict:
    """Bounded heavy-hitter probe on ``key``: observed share of the
    single most frequent key value in a per-partition head sample.

    Cost model (why this shape at 100 TB): one column-pruned map pass —
    ``monotonically_increasing_id()`` encodes the within-partition
    offset in its low 33 bits, so ``offset < k`` keeps the first k rows
    of every task with zero shuffle; the groupBy that follows
    aggregates <= partitions*k rows (a few MB), not the table. No
    driver collect beyond the 2-row top-share result. Head-of-partition
    sampling stays honest under key-clustered layouts too: a key owning
    p of the ROWS owns ~p of the PARTITIONS when the data is sorted by
    it, so its head-sample share still approximates p.
    """
    offset = F.pmod(F.monotonically_increasing_id(), F.lit(1 << 33))
    sample = (df.select(F.col(key).alias("_k"))
              .where(offset < rows_per_partition))
    row = (sample.groupBy("_k").count()
           .agg(F.sum("count").alias("n"),
                F.max("count").alias("top_n"),
                F.max_by("_k", "count").alias("top_k"))
           .collect()[0])  # single action: one pass over the sample
    n = row["n"] or 0
    if n == 0:
        return {"key_value": None, "share": 0.0, "sampled_rows": 0}
    return {"key_value": row["top_k"],
            "share": row["top_n"] / n,
            "sampled_rows": int(n)}


def skew_aware_join(big: DataFrame, small: DataFrame, key: str,
                    how: str = "inner", *,
                    dominance: float = 0.2,
                    salt_buckets: int = 16,
                    rows_per_partition: int = 1000) -> DataFrame:
    """Equi-join that auto-routes around narrow-key skew AQE can't see.

    Probes the big side with ``detect_dominant_key``; when one key's
    observed share >= ``dominance`` the join runs through
    ``salted_join`` (hot key scattered over ``salt_buckets`` reducers),
    otherwise it is a plain join and Catalyst/AQE keep full freedom
    (broadcast, skew-split, reorder). The chosen route is recorded on
    the returned DataFrame as ``_skew_route`` for tests/observability:
    ``{"route": "salted"|"plain", "probe": {...}}``.
    """
    probe = detect_dominant_key(big, key,
                                rows_per_partition=rows_per_partition)
    if probe["share"] >= dominance:
        out = salted_join(big, small, key, salt_buckets=salt_buckets,
                          how=how)
        route = "salted"
    else:
        out = big.join(small, key, how)
        route = "plain"
    out._skew_route = {"route": route, "probe": probe}
    return out


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort_cols: list[str] | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Pre-pays the shuffle once; every later join/aggregation on ``key``
    between same-bucketed tables is exchange-free. This is the batch
    analogue of the reference's per-shard partitioning (SURVEY S1) —
    co-location as a storage property.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location without a catalog entry (e.g. from a previous
    # session with an in-memory catalog) blocks saveAsTable — clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
