"""Skew and co-location utilities for 100 TB joins.

- ``salted_join``: explicit salting for hot keys — replicate the small
  side R ways, scatter the big side's hot keys across R salted
  partitions. AQE's skew-join splitting handles most cases at runtime;
  explicit salting is for the pathological key (one user = 10% of
  events) where even a split partition won't fit.
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
