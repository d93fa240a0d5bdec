"""Checkpoint compatibility: the ``triton_checkpoint`` view + stats.

Structured Streaming already checkpoints offsets/commits at
``checkpointLocation`` (exactly-once for the file sink) — the engine
needs no SQL checkpoint table. This module exists for parity with the
reference's monitoring surface:

- ``triton_checkpoint`` view (triton/checkpoint.go:95-103 DDL):
  (client, stream, shard, seq_num, updated) — materialized from the
  Spark commit log (one row per source partition, seq = last committed
  batch id).
- ``stats`` (S18, triton/checkpoint.go:127-151): per key
  "<client>.<stream>.<shard>.age" = now - updated seconds.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("client", T.StringType(), False),
    T.StructField("stream", T.StringType(), False),
    T.StructField("shard", T.StringType(), False),
    T.StructField("seq_num", T.StringType(), False),
    T.StructField("updated", T.LongType(), False),
])


def _scan_checkpoint_dir(checkpoint_root: str) -> list[tuple]:
    """Read Spark offset logs under <root>/<stream>-<client>/offsets/*."""
    rows = []
    if not os.path.isdir(checkpoint_root):
        return rows
    for qdir in sorted(os.listdir(checkpoint_root)):
        parts = qdir.rsplit("-", 1)
        if len(parts) == 2:
            stream, client = parts
        else:
            stream, client = qdir, ""
        offsets_dir = os.path.join(checkpoint_root, qdir, "offsets")
        if not os.path.isdir(offsets_dir):
            continue
        batches = [f for f in os.listdir(offsets_dir) if f.isdigit()]
        if not batches:
            continue
        latest = max(batches, key=int)
        path = os.path.join(offsets_dir, latest)
        updated = int(os.path.getmtime(path))
        rows.append((client, stream, "batch", str(latest), updated))
    return rows


def checkpoint_view(spark: SparkSession, checkpoint_root: str,
                    view_name: str = "triton_checkpoint") -> DataFrame:
    """Materialize the compat view from streaming checkpoint metadata."""
    df = spark.createDataFrame(_scan_checkpoint_dir(checkpoint_root),
                               schema=_CHECKPOINT_SCHEMA)
    df.createOrReplaceTempView(view_name)
    return df


# Reference DDL, verbatim (triton/checkpoint.go:95-103) — sqlite and
# postgres both accept it, which is exactly the reference's usage.
CREATE_TABLE_STMT = """
CREATE TABLE IF NOT EXISTS triton_checkpoint (
	client VARCHAR(255) NOT NULL,
	stream VARCHAR(255) NOT NULL,
	shard VARCHAR(255) NOT NULL,
	seq_num VARCHAR(255) NOT NULL,
	updated INTEGER NOT NULL,
	PRIMARY KEY (client, stream, shard))
"""


def mirror_to_sqlite(checkpoint_root: str, db_path: str) -> int:
    """Mirror the checkpoint view into an external SQL table.

    Structured Streaming's own checkpoint (offsets/commits) is the
    source of truth; this OPT-IN mirror exists so external monitors
    that read the reference's ``triton_checkpoint`` table
    (triton/checkpoint.go:95-103) keep working unmodified. Upsert
    semantics follow Checkpointer.Checkpoint (checkpoint.go:27-76):
    one transaction, insert-or-update keyed on (client, stream,
    shard). Returns the number of rows mirrored.
    """
    import sqlite3

    rows = _scan_checkpoint_dir(checkpoint_root)
    con = sqlite3.connect(db_path)
    try:
        with con:  # single transaction, like the Go Tx
            con.execute(CREATE_TABLE_STMT)
            con.executemany(
                "INSERT INTO triton_checkpoint "
                "(client, stream, shard, seq_num, updated) "
                "VALUES (?, ?, ?, ?, ?) "
                "ON CONFLICT(client, stream, shard) DO UPDATE SET "
                "seq_num = excluded.seq_num, updated = excluded.updated",
                rows)
    finally:
        con.close()
    return len(rows)


def stats_from_sqlite(db_path: str, client: str | None = None) -> dict[str, int]:
    """External-monitor ``stats`` (S18) straight from the SQL mirror —
    the reference's GetCheckpointStats query shape
    (triton/checkpoint.go:127-151), no Spark session needed."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        sql = ("SELECT client, stream, shard, "
               "strftime('%s','now') - updated FROM triton_checkpoint")
        args: tuple = ()
        if client:
            sql += " WHERE client = ?"
            args = (client,)
        return {f"{c}.{s}.{sh}.age": int(age)
                for c, s, sh, age in con.execute(sql, args)}
    finally:
        con.close()


def checkpoint_stats(spark: SparkSession, checkpoint_root: str,
                     client: str | None = None) -> dict[str, int]:
    """Reference ``triton stats`` output (checkpoint.go:127-151):
    {"<client>.<stream>.<shard>.age": seconds_since_update}."""
    df = checkpoint_view(spark, checkpoint_root)
    if client:
        df = df.where(F.col("client") == client)
    now = int(time.time())
    out = {}
    for r in df.collect():
        out[f"{r['client']}.{r['stream']}.{r['shard']}.age"] = now - r["updated"]
    return out
