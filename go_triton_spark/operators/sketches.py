"""Mergeable distinct-count sketches (KMV / theta family).

The 100 TB story: exact COUNT(DISTINCT) over a high-cardinality column
shuffles every distinct value; a KMV (k-minimum-values) sketch carries
a BOUNDED k-row summary per group that is map-side combinable and
MERGEABLE across shards/days/partitions — the property that lets a
nightly job maintain per-day sketches and answer "distinct users this
quarter" by merging 90 tiny summaries instead of rescanning a quarter
of the lake (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD'07; the same estimator family as
Apache DataSketches' theta sketch).

Everything here is DETERMINISTIC integer math on a 60-bit md5-derived
hash (same bytes in Spark and DuckDB), so the driver gate checks the
ESTIMATES exactly, not just row counts:

    h(v)       = int(md5(v)[:15], 16)            — uniform in [0, 2^60)
    theta est. = floor((k - 1) * 2^60 / h_(k))   — h_(k) = k-th smallest
                 (exact count when the group has fewer than k values)

The merge operation is just "union the hash sets, re-take the k
smallest" — associative and commutative, which is what makes the
shard-merge query below a genuine mergeability proof.

Oracle note: the cross-engine contract is only the HEX-PREFIX hash
(identical md5 bytes both sides); estimates stay in BIGINT-safe range
because (k-1) * 2^60 < 2^66 is computed in DECIMAL(38,0) on the Spark
side and HUGEINT in DuckDB, then floored to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

_K = 64                    # sketch size (k minimum values per group)
_UNIVERSE = 1 << 60        # 60-bit hash universe (15 md5 hex digits)

# Spark-side 60-bit hash of a column (conv() returns a decimal string;
# the binary cast is required under ANSI mode — no implicit coercion)
_H = ("cast(conv(substr(md5(cast(cast({col} as string) as binary)), "
      "1, 15), 16, 10) as bigint)")

# DuckDB-side twin
_H_DUCK = "(('0x' || substr(md5(({col})::VARCHAR), 1, 15))::BIGINT)"


def _estimate_expr(n_col: str, kth_col: str):
    """Theta estimate in exact integer math: floor((k-1)*2^60 / h_k),
    falling back to the exact count below k values."""
    numer = (F.lit(_K - 1).cast("decimal(38,0)")
             * F.lit(_UNIVERSE).cast("decimal(38,0)"))
    return (F.when(F.col(n_col) < _K, F.col(n_col))
            .otherwise(F.floor(numer / F.col(kth_col)))
            .cast("long"))


_EST_DUCK = f"""
    CASE WHEN n < {_K} THEN n
         ELSE (({_K - 1}::HUGEINT * {_UNIVERSE}::HUGEINT) // kth)::BIGINT
    END
"""


@query(
    "sketch_theta_distinct",
    oracle=f"""
    WITH h AS (SELECT DISTINCT event_type,
                      {_H_DUCK.format(col="user_id")} AS h
               FROM events),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS rk
          FROM h),
    s AS (SELECT event_type, count(*) AS n,
                 max(CASE WHEN rk = {_K} THEN h END) AS kth
          FROM r WHERE rk <= {_K} GROUP BY event_type),
    x AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
    SELECT s.event_type,
           cast({_EST_DUCK} as bigint) AS theta_estimate,
           x.exact_distinct
    FROM s JOIN x USING (event_type)
    """,
    tags=("llm", "sketch", "agg"),
)
def sketch_theta_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta distinct-user estimate per event_type, next to the
    exact count (the gate checks the estimate EXACTLY — deterministic
    integer math, not a tolerance band).

    Plan at 100 TB: one shuffle of (event_type, 8-byte hash) pairs
    AFTER a distinct that is itself map-side combinable; the window
    that ranks hashes sees at most the distinct values but every
    group's state the ESTIMATOR needs is k rows — a production
    implementation caps it with a k-row heap UDAF; here the rank
    filter expresses the same bound declaratively and lets Catalyst
    run it as one exchange + sort."""
    (e,) = tables(spark, sf_dir, "events")
    # hash FIRST, then one distinct on (group, h): the hash is a pure
    # function of the value, so this equals distinct-then-hash with a
    # single exchange instead of two
    h = (e.select("event_type",
                  F.expr(_H.format(col="user_id")).alias("h"))
         .distinct())
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = h.select("event_type", "h", F.row_number().over(w).alias("rk"))
    # n counts the rank-capped rows, so n < k iff the group is exact
    sk = (ranked.where(F.col("rk") <= _K)
          .groupBy("event_type")
          .agg(F.count("*").alias("n"),
               F.max(F.when(F.col("rk") == _K, F.col("h"))).alias("kth")))
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return (sk.join(exact, "event_type")
            .select("event_type",
                    _estimate_expr("n", "kth").alias("theta_estimate"),
                    "exact_distinct"))


@query(
    "sketch_theta_union",
    oracle=f"""
    WITH h AS (SELECT DISTINCT event_type, event_id % 2 AS shard,
                      {_H_DUCK.format(col="user_id")} AS h
               FROM events),
    shard_k AS (SELECT event_type, shard, h FROM (
                  SELECT event_type, shard, h,
                         row_number() OVER (PARTITION BY event_type, shard
                                            ORDER BY h) AS rk
                  FROM h) WHERE rk <= {_K}),
    merged AS (SELECT DISTINCT event_type, h FROM shard_k),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS rk
          FROM merged),
    s AS (SELECT event_type, count(*) AS n,
                 max(CASE WHEN rk = {_K} THEN h END) AS kth
          FROM r WHERE rk <= {_K} GROUP BY event_type),
    x AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
    SELECT s.event_type,
           cast({_EST_DUCK} as bigint) AS theta_estimate,
           x.exact_distinct
    FROM s JOIN x USING (event_type)
    """,
    tags=("llm", "sketch", "agg"),
)
def sketch_theta_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE across shards: build an independent k-min sketch
    per (event_type, event_id%2) shard, then merge the two bounded
    summaries (union the hash sets, re-take the k smallest) and
    estimate the union's cardinality — without ever re-touching the
    raw rows. The estimate provably equals the single-pass sketch of
    the union (k-min of a union is contained in the union of k-mins),
    which the gate verifies exactly.

    This is the shape that matters at 100 TB: per-day/per-shard
    sketches are tiny (k rows), merge in O(k log k), and answer
    cross-partition distinct questions without a rescan."""
    (e,) = tables(spark, sf_dir, "events")
    h = (e.select("event_type", (F.col("event_id") % 2).alias("shard"),
                  F.expr(_H.format(col="user_id")).alias("h"))
         .distinct())
    ws = Window.partitionBy("event_type", "shard").orderBy("h")
    shard_k = (h.select("event_type", "shard", "h",
                        F.row_number().over(ws).alias("rk"))
               .where(F.col("rk") <= _K))
    merged = shard_k.select("event_type", "h").distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    r = merged.select("event_type", "h", F.row_number().over(w).alias("rk"))
    sk = (r.where(F.col("rk") <= _K)
          .groupBy("event_type")
          .agg(F.count("*").alias("n"),
               F.max(F.when(F.col("rk") == _K, F.col("h"))).alias("kth")))
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return (sk.join(exact, "event_type")
            .select("event_type",
                    _estimate_expr("n", "kth").alias("theta_estimate"),
                    "exact_distinct"))


# =====================================================================
# Count-Min sketch (mergeable frequency estimation)
# =====================================================================

_CMS_D = 4      # hash rows
_CMS_W = 64     # buckets per row

# row-salted 32-bit md5 prefix -> bucket (identical bytes both engines)
_CMS_B = ("pmod(cast(conv(substr(md5(cast(concat(tok, '#', '{r}') "
          "as binary)), 1, 8), 16, 10) as bigint), " + str(_CMS_W) + ")")
_CMS_B_DUCK = ("(('0x' || substr(md5(tok || '#' || '{r}'), 1, 8))::BIGINT"
               f" % {_CMS_W})")


def _cms_oracle() -> str:
    per_row = ", ".join(
        f"min(CASE WHEN r = {r} THEN c END)" for r in range(_CMS_D))
    bucket_rows = " UNION ALL ".join(
        f"SELECT tok, source, {r} AS r, {_CMS_B_DUCK.format(r=r)} AS b "
        f"FROM toks" for r in range(_CMS_D))
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS tok, source
      FROM documents),
    tb AS ({bucket_rows}),
    shard_counters AS (
      SELECT source, r, b, count(*) AS c FROM tb GROUP BY 1, 2, 3),
    counters AS (
      SELECT r, b, sum(c) AS c FROM shard_counters GROUP BY 1, 2),
    probes AS (SELECT DISTINCT tok FROM toks),
    pb AS ({bucket_rows.replace('FROM toks', 'FROM probes')
            .replace(', source,', ',')}),
    est AS (
      SELECT pb.tok, min(counters.c) AS est
      FROM (SELECT DISTINCT tok, r, b FROM pb) pb
      JOIN counters ON counters.r = pb.r AND counters.b = pb.b
      GROUP BY pb.tok)
    SELECT tok, cast(est as bigint) AS est FROM est
    """


@query(
    "sketch_cms_heavy_hitters",
    oracle=_cms_oracle(),
    tags=("llm", "sketch"),
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates — the frequency twin of
    the theta distinct sketch: a (4 x 64) counter grid per shard,
    MERGED BY ADDITION across shards (CMS is linear — the property
    that lets per-day/per-shard sketches answer corpus-wide heavy-
    hitter queries without rescans), then every distinct token probed
    with est = min over rows of its bucket counter.

    The plan PROVES the mergeability: counters build per `source`
    shard (groupBy source,row,bucket — map-side combinable), merge by
    summation, and only then serve estimates; the merged grid is 256
    rows, so the probe join broadcasts. Estimates are deterministic
    integer math on md5-derived buckets — the DuckDB oracle rebuilds
    the identical sketch and must match every estimate EXACTLY,
    including collision-inflated ones (CMS overestimates; the gate
    checks the sketch's arithmetic, not a lossy 'close enough').
    """
    (d,) = tables(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.expr(
            "filter(split(lower(text), ' '), t -> t <> '')")).alias("tok"))
    bucket_structs = ", ".join(
        f"named_struct('r', {r}, 'b', {_CMS_B.format(r=r)})"
        for r in range(_CMS_D))
    tb = toks.select(
        "source", "tok",
        F.explode(F.expr(f"array({bucket_structs})")).alias("rb"),
    ).select("source", "tok", F.col("rb.r").alias("r"),
             F.col("rb.b").alias("b"))
    shard_counters = tb.groupBy("source", "r", "b").count()
    counters = (shard_counters.groupBy("r", "b")
                .agg(F.sum("count").alias("c")))
    # distinct FIRST, then recompute buckets per distinct token
    # (mirrors the oracle's `SELECT DISTINCT tok` probe CTE): the
    # old distinct over exploded (tok, r, b) rows shuffled 4x the
    # volume and md5-hashed every OCCURRENCE instead of every token
    probes = toks.select("tok").distinct().select(
        "tok",
        F.explode(F.expr(f"array({bucket_structs})")).alias("rb"),
    ).select("tok", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (probes.join(F.broadcast(counters), ["r", "b"])
            .groupBy("tok").agg(F.min("c").cast("long").alias("est")))


# =====================================================================
# HyperLogLog (mergeable register-vector distinct estimation)
# =====================================================================
#
# p = 8 -> m = 256 registers; register index = top 8 bits of the same
# 60-bit md5 hash the theta family uses, rho = leading-zero count of
# the remaining 52 bits + 1 (Flajolet et al., "HyperLogLog: the
# analysis of a near-optimal cardinality estimation algorithm",
# AofA'07). Where theta keeps the k smallest hashes, HLL keeps a FIXED
# 256-slot register vector whose merge is elementwise max — the
# smallest possible mergeable summary, the one production systems ship
# between days/shards.
#
# Determinism: the register contribution is kept as the exact integer
# 2^(53 - M_j)  (= 2 * pow2floor(suffix), or 1 for the all-zero
# suffix), so the harmonic sum S2 = sum_j 2^(53 - M_j) is an exact
# BIGINT and the raw estimate
#     E = alpha_256 * m^2 / sum_j 2^(-M_j)
#       = floor(floor(ALPHA_NUM * m^2 * 2^53 / S2) / 10^10)
# is pure integer math (nested-floor identity holds for positive
# integers), byte-identical in both engines. The small-range
# (linear-counting) correction needs ln() and is a presentation-layer
# choice; the gate pins the raw mergeable estimator plus the zero
# count V it would need.

_HLL_M = 256
_HLL_NUM = 4239933024614429306506742595584   # round(a_256*1e10)*m^2*2^53
_HLL_DEN = 10_000_000_000


def _smear_pow2(x: str, spark: bool) -> str:
    """Largest power of two <= x (x > 0), exact integer bit-smearing —
    floor(log2()) in doubles mis-rounds near 2^52 boundaries."""
    sh = (lambda e, n: f"({e} | shiftright({e}, {n}))") if spark else \
         (lambda e, n: f"({e} | ({e} >> {n}))")
    # cascade through a temp-free nested expression
    e = x
    for n in (1, 2, 4, 8, 16, 32):
        e = sh(e, n)
    return f"(({e} + 1) >> 1)" if not spark else \
        f"shiftright(({e} + 1), 1)"


def _hll_c2(spark: bool) -> str:
    """Per-row register contribution 2^(53 - rho) from the hash."""
    # NB: Spark's shiftleft(1, 52) shifts inside 32-bit int — the
    # operand must be BIGINT before the shift, not after.
    rem = "(h & ((1::BIGINT << 52) - 1))" if not spark else \
        "(h & (shiftleft(cast(1 as bigint), 52) - 1))"
    p2f = _smear_pow2(rem, spark)
    return f"(CASE WHEN {rem} = 0 THEN 1 ELSE 2 * {p2f} END)"


_HLL_ORACLE_CORE = f"""
    b AS (SELECT event_type, {_H_DUCK.format(col="user_id")} AS h
          FROM events),
    rows_ AS (SELECT event_type, (h >> 52) AS idx,
                     {_hll_c2(False)} AS c2
              FROM b),
    regs AS (SELECT event_type, idx, min(c2) AS rc
             FROM rows_ GROUP BY event_type, idx),
    sk AS (SELECT event_type,
                  cast(count(*) as bigint) AS n_present,
                  cast(sum(rc) as bigint) AS s_present
           FROM regs GROUP BY event_type),
    est AS (SELECT event_type,
                   cast({_HLL_M} - n_present as bigint) AS v_zero,
                   cast(s_present
                        + ({_HLL_M} - n_present) * (1::BIGINT << 53)
                        as bigint) AS s2
            FROM sk),
    x AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
    SELECT est.event_type,
           cast(({_HLL_NUM}::HUGEINT // est.s2::HUGEINT)
                // {_HLL_DEN} as bigint) AS hll_estimate,
           est.v_zero, est.s2, x.exact_distinct
    FROM est JOIN x USING (event_type)
"""


def _hll_sketch(rows: DataFrame) -> DataFrame:
    """(event_type, idx, c2) rows -> per-group raw-HLL columns."""
    regs = (rows.groupBy("event_type", "idx")
            .agg(F.min("c2").alias("rc")))
    sk = (regs.groupBy("event_type")
          .agg(F.count("*").alias("n_present"),
               F.sum("rc").alias("s_present")))
    s2 = (F.col("s_present")
          + (F.lit(_HLL_M) - F.col("n_present"))
          * F.lit(1 << 53)).cast("long")
    numer = F.lit(str(_HLL_NUM)).cast("decimal(38,0)")
    out = sk.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("n_present")).cast("long").alias("v_zero"),
        s2.alias("s2"))
    return out.select(
        "event_type",
        F.floor(F.floor(numer / F.col("s2")) / F.lit(_HLL_DEN))
         .cast("long").alias("hll_estimate"),
        "v_zero", "s2")


def _hll_rows(e: DataFrame) -> DataFrame:
    h = F.expr(_H.format(col="user_id")).alias("h")
    b = e.select("event_type", h)
    return b.select(
        "event_type",
        F.expr("shiftright(h, 52)").cast("long").alias("idx"),
        F.expr(_hll_c2(True)).cast("long").alias("c2"))


@query(
    "sketch_hll_distinct",
    oracle=f"WITH {_HLL_ORACLE_CORE}",
    tags=("llm", "sketch", "agg"),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-HLL distinct-user estimate per event_type next to the exact
    count; the gate checks the ESTIMATE, the zero-register count and
    the exact harmonic sum value-for-value.

    Plan at 100 TB: rows collapse to at most m=256 register cells per
    group in ONE map-side-combinable exchange (min is an algebraic
    aggregate), the register vector never exceeds 2 KiB per group, and
    unlike exact count-distinct no raw value ever crosses the wire."""
    (e,) = tables(spark, sf_dir, "events")
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return _hll_sketch(_hll_rows(e)).join(exact, "event_type").select(
        "event_type", "hll_estimate", "v_zero", "s2", "exact_distinct")


@query(
    "sketch_hll_union",
    oracle=f"""
    WITH b AS (SELECT event_type, event_id % 4 AS shard,
                      {_H_DUCK.format(col="user_id")} AS h
               FROM events),
    rows_ AS (SELECT event_type, shard, (h >> 52) AS idx,
                     {_hll_c2(False)} AS c2
              FROM b),
    shard_regs AS (SELECT event_type, shard, idx, min(c2) AS rc
                   FROM rows_ GROUP BY event_type, shard, idx),
    merged AS (SELECT event_type, idx, min(rc) AS rc
               FROM shard_regs GROUP BY event_type, idx),
    sk AS (SELECT event_type,
                  cast(count(*) as bigint) AS n_present,
                  cast(sum(rc) as bigint) AS s_present
           FROM merged GROUP BY event_type),
    est AS (SELECT event_type,
                   cast({_HLL_M} - n_present as bigint) AS v_zero,
                   cast(s_present
                        + ({_HLL_M} - n_present) * (1::BIGINT << 53)
                        as bigint) AS s2
            FROM sk),
    x AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
    SELECT est.event_type,
           cast(({_HLL_NUM}::HUGEINT // est.s2::HUGEINT)
                // {_HLL_DEN} as bigint) AS hll_estimate,
           est.v_zero, est.s2, x.exact_distinct
    FROM est JOIN x USING (event_type)
    """,
    tags=("llm", "sketch", "agg"),
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGE proof: four independent per-shard register vectors,
    merged by elementwise max (min over the 2^(53-rho) encoding),
    estimate the union — the register algebra that lets per-day
    sketches answer quarter-wide distinct questions without a rescan.
    Merging is associative/commutative/idempotent, so the merged
    estimate provably equals the single-pass sketch; the gate pins
    that equality exactly."""
    (e,) = tables(spark, sf_dir, "events")
    # shard rides the row explicitly (the _hll_rows helper projects
    # down to the 3 distinct-level columns)
    h = F.expr(_H.format(col="user_id")).alias("h")
    b = e.select("event_type", (F.col("event_id") % 4).alias("shard"), h)
    rows = b.select(
        "event_type", "shard",
        F.expr("shiftright(h, 52)").cast("long").alias("idx"),
        F.expr(_hll_c2(True)).cast("long").alias("c2"))
    shard_regs = (rows.groupBy("event_type", "shard", "idx")
                  .agg(F.min("c2").alias("rc")))
    merged = (shard_regs.groupBy("event_type", "idx")
              .agg(F.min("rc").alias("c2")))
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return _hll_sketch(merged).join(exact, "event_type").select(
        "event_type", "hll_estimate", "v_zero", "s2", "exact_distinct")
