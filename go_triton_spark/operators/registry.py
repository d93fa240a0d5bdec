"""Query registry: (name -> Spark callable + DuckDB oracle SQL).

Every operator the engine claims is registered here and surfaced through
``__spark_entry__.queries()`` / ``oracle_sql()``. The driver runs both
sides at sf0.01 and hash-compares (row count + schema + order-insensitive
value hash, columns sorted by name).

Cross-engine determinism policy (applies to every query in this package):

- **Money/double sums**: per-row expression (IEEE double, identical in
  both engines) -> CAST to DECIMAL(30,8) (round-half-away in both) ->
  exact decimal sum -> CAST final to DOUBLE. No float-summation-order
  divergence can survive this. MAGNITUDE BOUND: the final
  decimal->double cast is correctly rounded in Spark (BigDecimal) but
  NOT in DuckDB (int128 scaling), so the two engines can differ by one
  ulp once |total| * 10^scale exceeds 2^53 — i.e. above ~9e7 for
  scale 8 (measured at sf0.1 on o_totalprice totals ~1.2e10). Sums
  that can cross that line use the scaled-integer path instead:
  round(x * 10^s) -> exact BIGINT sum -> one int64->double conversion
  (correctly rounded in BOTH engines) -> one division by 10^s. See
  _isum/_isum2 in relational.py; applied to agg_basic, agg_cube,
  agg_grouping_sets, sql_cte_interface, customer_rfm, and q1's
  product columns.
- **Averages**: exact decimal sum cast to double, divided by count
  (single IEEE division) — never the engine's avg() over doubles.
- **Top-k / limit**: always a total order (unique tie-break column).
- **Timestamps in output**: formatted to strings (microsecond precision)
  or extracted to ints, identically on both sides.
- **Float outputs** (similarity scores): either omitted from the output
  (threshold filters emit ids only) or computed with identical
  operation order and rounded.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # DuckDB SQL; None -> rows-only check
    doc: str = ""
    tags: tuple = ()
    #: None -> the query is covered by a generated-corpus batch in
    #: tests/test_registry_differential.py. A string is the REASON the
    #: query is excluded from differential fuzzing by design — the
    #: coverage test there asserts every registry entry is one or the
    #: other, so a new query can't silently skip fuzzing (round-7
    #: verdict ask: exclusions documented per-query, not in a comment).
    fuzz_exclusion: str | None = None


REGISTRY: dict[str, QueryDef] = {}


def _normalize_output(df: DataFrame) -> DataFrame:
    """Widen narrow numeric output columns to the oracle's natural types.

    DuckDB surfaces every integer result as int64 (and sums as HUGEINT)
    in pandas, while Spark emits int32 for row_number/ntile/length/year
    etc. Equal VALUES in different dtypes still hash-diverge in the
    driver's canonicalizer, so every registered query's final schema is
    widened here: byte/short/int -> bigint, float -> double. This is a
    driver-side Project that Catalyst collapses into the final stage —
    no extra pass over the data.
    """
    from pyspark.sql.types import ByteType, FloatType, IntegerType, ShortType

    casts = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, (ByteType, ShortType, IntegerType)):
            casts.append(F.col(f.name).cast("long").alias(f.name))
            changed = True
        elif isinstance(f.dataType, FloatType):
            casts.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        else:
            casts.append(F.col(f.name))
    return df.select(*casts) if changed else df


def query(name: str, oracle: str | None = None, tags: tuple = (),
          fuzz_exclusion: str | None = None):
    """Decorator registering a (spark_fn, oracle_sql) pair."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _normalize_output(fn(spark, sf_dir))
        run.__doc__ = fn.__doc__
        run.__name__ = fn.__name__
        REGISTRY[name] = QueryDef(name=name, spark=run, oracle=oracle,
                                  doc=fn.__doc__ or "", tags=tuple(tags),
                                  fuzz_exclusion=fuzz_exclusion)
        return fn
    return wrap


def _sql_literal(v) -> str:
    """Render one driver-side value as a Spark SQL literal expression.

    Doubles go through a string cast: ``repr(float)`` is the shortest
    round-trip decimal and the JVM's string->double cast parses to the
    nearest double, so the bits are identical to handing the float over
    py4j — including -0.0, subnormals, NaN and the infinities (spelled
    the way the JVM cast accepts them)."""
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        # escapedStringLiterals=false (default): backslash escapes live
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ", ".join(_sql_literal(x) for x in v) + ")"
    raise TypeError(f"local_df: unsupported literal type {type(v)!r}")


def local_df(spark: SparkSession, rows: list, cols: list) -> DataFrame:
    """JVM LocalRelation from driver-side literal rows.

    ``spark.createDataFrame(list)`` plans as a Scan ExistingRDD over
    applySchemaToPythonRDD: every ACTION re-evaluates the pickled rows
    through forked Python workers — measured 7.0 cpu_s PER ACTION for a
    5-row dim table at local[32] (r12, join_range isolated probe), paid
    again on every bench rep and every downstream reuse. Rendering the
    rows as a VALUES clause keeps the tiny table a LocalTableScan: no
    Python boundary, no job for the broadcast build, and exact size
    statistics for the broadcast planner. Use for BOUNDED literal dim
    tables only (bands, collected centroids) — never for real data.

    ``cols`` is [(name, sql_type), ...]; each cell is CAST to its
    declared type so inferred literal types can't drift from the
    ``createDataFrame(schema=...)`` form this replaces.
    """
    if not rows:    # VALUES needs >=1 tuple; cost is moot when empty
        return spark.createDataFrame(
            [], ", ".join(f"{n} {t}" for n, t in cols))
    sel = ", ".join(f"CAST(col{i + 1} AS {t}) AS {n}"
                    for i, (n, t) in enumerate(cols))
    vals = ", ".join(
        "(" + ", ".join(_sql_literal(c) for c in row) + ")" for row in rows)
    return spark.sql(f"SELECT {sel} FROM VALUES {vals}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns surface as bigint nanos under
    # spark.sql.legacy.parquet.nanosAsLong; normalize to microsecond
    # timestamp_ntz (floor-truncate, matching DuckDB's %f formatting).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load driver tables; single point for read-path tuning."""
    return [load_table(spark, sf_dir, n) for n in names]


def _estimate_input_rows(df: DataFrame) -> int | None:
    """Driver-side row estimate from parquet footers — no Spark job.

    ``inputFiles()`` is a driver metadata call; footers are read for at
    most 8 files and extrapolated, so the estimate stays O(1) even when
    a 100 TB table lists thousands of files. Returns None (estimate
    unavailable) for non-file plans, object-store URIs, or non-parquet
    sources — callers fall back to the unconditional spread."""
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    sample = files[:8]
    total = 0
    for uri in sample:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file") or not uri.endswith(".parquet"):
            return None
        try:
            total += pq.ParquetFile(unquote(parsed.path)).metadata.num_rows
        except Exception:
            return None
    if len(files) > len(sample):
        total = int(total * len(files) / len(sample))
    return total


def spread(df: DataFrame, spark: SparkSession,
           rows_per_task: int = 5_000) -> DataFrame:
    """Repartition a compute-heavy input up to the session parallelism,
    COST-AWARE (round-7 verdict ask): the exchange only fires when the
    estimated work actually fills the extra tasks.

    Single-file local inputs scan as ONE partition, so every downstream
    interpreted expression (higher-order functions, levenshtein, UDFs)
    runs in one task — and AQE won't widen it because the BYTES are
    small even when the COMPUTE is not. But the fix must not overshoot:
    round 6's unconditional repartition(nparts) cost udf_map_in_arrow
    1.8x at sf0.1, paying a full exchange to parallelize ~0.2 s of
    compute. So the target partition count is sized to the input:
    ``ceil(estimated_rows / rows_per_task)`` capped at the session
    parallelism, skipped entirely when the scan already has at least
    that many partitions. ``rows_per_task`` encodes the caller's
    per-row cost (decoder-heavy mm ops pass ~500; light Arrow passes
    ~25k) so a task lands in the 0.25-1 s sweet spot. At cluster scale
    a 100 TB table already scans as thousands of partitions and this
    is a no-op; when the row estimate is unavailable (non-parquet,
    object store) it falls back to the always-spread behavior, the
    safe choice for compute-dense paths."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scan_parts = df.rdd.getNumPartitions()
    if scan_parts >= nparts:
        return df
    est = _estimate_input_rows(df)
    if est is None:
        return df.repartition(nparts)
    target = min(nparts, -(-est // max(1, rows_per_task)))
    if target <= scan_parts:
        return df
    return df.repartition(target)


def contract(df: DataFrame, spark: SparkSession, est_from: DataFrame,
             rows_per_task: int = 2_000) -> DataFrame:
    """The inverse of spread(): COALESCE an over-partitioned input down
    to its own per-row cost — for LIGHT consumers of a shared cache
    whose partitioning was sized to a heavier sibling.

    _shingle_df is cached at rows_per_task=150 because the n-gram
    Jaccard family pays ~1 ms/row downstream; a consumer that only does
    an Arrow-speed map over the same cache (e.g. decontaminate's
    broadcast overlap probe) then inherits 32 near-empty tasks per
    stage and pays pure scheduling overhead (r8 self-twin: 0.44 s ->
    0.72 s). coalesce() is a NARROW dependency — no exchange — so
    contracting costs nothing but undoes the fanout. ``est_from``
    supplies the row estimate (the raw parquet scan, since the cached
    plan has no inputFiles); when the estimate is unavailable the input
    is returned unchanged — never guess a contraction. At cluster scale
    est/rows_per_task exceeds the parent partition count and coalesce
    is a no-op, so this is strictly small-input hygiene."""
    est = _estimate_input_rows(est_from)
    if est is None:
        return df
    target = max(1, -(-est // max(1, rows_per_task)))
    return df.coalesce(target)


def scaling_dim(df: DataFrame) -> DataFrame:
    """Join-side hint policy for dimensions whose row count scales WITH
    the data (TPC-H customer/supplier/part grow linearly with SF; at
    the 100 TB target customer alone is terabytes).

    Returns the input UNHINTED, deliberately: a hard ``F.broadcast``
    here is an unconditional driver collect — OOM at scale — and AQE
    cannot override a user hint. Unhinted, the planner broadcasts from
    measured sizes when the side is genuinely small (always at test SF,
    never at 100 TB) and otherwise shuffles both sides on the join key;
    AQE upgrades shuffle joins back to broadcast at runtime whenever a
    filtered side lands under the adaptive threshold. That is the right
    plan at EVERY scale, which no static hint can be.

    Truly bounded relations — region (5 rows), nation (25), literal
    band/segment tables, one-row aggregates — keep an explicit
    ``F.broadcast`` at their call sites; their size is independent of
    data scale, so the hint is always correct and saves the planner a
    size estimate.
    """
    return df
