"""Relational surface, part 4: regression aggregates, lateral/ordinality
explode, sequence generation, discrete percentiles, data profiling,
TF-IDF ranking, batch sessionization, deterministic stratified sampling.

All absent from the reference (SURVEY §2.2 — go-triton has no relational
engine; closest surface is the whole-record JSON projection at
triton.go:351-366). Each is a Spark built-in composition with a DuckDB
oracle; determinism policy per registry.py (exact decimal sums, rounded
doubles, total orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_triton_spark.operators.registry import query, tables


def _dsum(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(30,8))) as double)"


@query(
    "agg_regression",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             {_dsum('l_quantity')} AS sx,
             {_dsum('l_extendedprice')} AS sy,
             {_dsum('l_quantity * l_quantity')} AS sxx,
             {_dsum('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
             + 0 AS slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)
                  * sx) / n, 6) + 0 AS intercept
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression (slope/intercept of price on quantity)
    from exact decimal sufficient statistics — the engines' regr_slope
    over doubles is summation-order-dependent; this form is reproducible
    at any parallelism. One map-side-combinable pass; scales to 100 TB
    because the sufficient statistics are 5 numbers per group.

    Zero-variance groups (every row the same quantity) have no defined
    slope: both sides NULL it via an explicit nullif denominator —
    regr_slope parity. Found by the relational registry fuzz: ANSI
    Spark raised DIVIDE_BY_ZERO where DuckDB's double division quietly
    returned NULL."""
    (li,) = tables(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        WITH s AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 {_dsum('l_quantity')} AS sx,
                 {_dsum('l_extendedprice')} AS sy,
                 {_dsum('l_quantity * l_quantity')} AS sxx,
                 {_dsum('l_quantity * l_extendedprice')} AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
                 + 0 AS slope,
               round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)
                      * sx) / n, 6) + 0 AS intercept
        FROM s
    """)


@query(
    "lateral_posexplode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id < 200
    """,
    tags=("lateral", "explode"),
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view with ordinality). Generator runs
    inside codegen; no Python. Position comes from the generator, not a
    window, so there is no shuffle at all — plan is Scan→Filter→Generate."""
    (d,) = tables(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 200)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    )


@query(
    "array_sequence_explode",
    oracle="""
    SELECT o_orderkey,
           unnest(generate_series(1, cast(o_orderkey % 4 + 1 AS bigint))) AS i
    FROM orders WHERE o_orderkey < 1000
    """,
    tags=("lateral", "sequence"),
)
def array_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation via sequence + explode (the Spark idiom for
    gap-free ranges; DuckDB: generate_series, inclusive on both ends).
    Bounds kept >= start on both sides — Spark's sequence(a,b) runs
    descending when b < a while generate_series returns empty."""
    (o,) = tables(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.explode(F.expr("sequence(1, o_orderkey % 4 + 1)")).alias("i"),
        )
    )


@query(
    "agg_percentile_disc",
    oracle="""
    SELECT event_type,
           min(value) FILTER (WHERE cd >= 0.5) AS p50_disc,
           min(value) FILTER (WHERE cd >= 0.9) AS p90_disc
    FROM (SELECT event_type, value,
                 cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
          FROM events)
    GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentile = smallest value whose cume_dist >= p, built
    from the ANSI definition directly (window + filtered min) so both
    engines agree bit-for-bit — their built-in percentile_disc/
    quantile_disc differ on tie/rounding conventions. Output values are
    members of the input set: no interpolation arithmetic at all."""
    (e,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return (
        e.select("event_type", "value", F.cume_dist().over(w).alias("cd"))
        .groupBy("event_type")
        .agg(
            F.expr("min(value) FILTER (WHERE cd >= 0.5)").alias("p50_disc"),
            F.expr("min(value) FILTER (WHERE cd >= 0.9)").alias("p90_disc"),
        )
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col, count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct,
           cast(min(o_custkey) AS varchar) AS min_v,
           cast(max(o_custkey) AS varchar) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), min(o_orderpriority),
           max(o_orderpriority)
    FROM orders
    """,
    tags=("profile", "agg"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (null count, cardinality, bounds)
    — the first pass any 100 TB curation pipeline runs over a new table.

    SINGLE-PASS plan: all columns' aggregates (incl. the three
    count(DISTINCT)s, which Catalyst handles with one Expand) run in
    one scan + one aggregation; the per-column rows are then unpacked
    from the single result row with an explode — versus the naive
    UNION-of-scans shape (the oracle's spelling) that reads the table
    once per column. At 100 TB that is 1 scan instead of N. For
    extreme column counts swap count(DISTINCT) for
    approx_count_distinct (see agg_approx_distinct)."""
    (o,) = tables(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.countDistinct(c).alias(f"dist_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    one = o.agg(*aggs)
    structs = ", ".join(
        f"named_struct('col', '{c}', 'n_null', null_{c}, "
        f"'n_distinct', dist_{c}, 'min_v', min_{c}, 'max_v', max_{c})"
        for c in cols)
    return (one.select(F.explode(F.expr(f"array({structs})")).alias("p"))
            .select("p.*"))


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> ''
      GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM toks WHERE tok <> ''
      GROUP BY tok
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(cast(n.n AS double) / df.df), 6) AS score
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, score FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tok) AS rk
      FROM scored) t
    WHERE rk <= 3
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Scores are rounded BEFORE
    ranking so an ulp of ln() divergence cannot flip the order; ties
    break on the token string (total order).

    Single-tokenize plan: document frequency is derived from the tf
    rows themselves — (doc_id, tok) is unique after the tf groupBy, so
    df(tok) = count(*) OVER (PARTITION BY tok). The naive shape (and
    the oracle's spelling) tokenizes the corpus TWICE (tf branch + df
    branch) and joins; here the expensive explode+lower pass over 100
    TB of text runs once, and df costs one narrow shuffle of the
    (doc, tok, tf) triples. n_docs is a count-only scan (column-pruned
    to parquet metadata)."""
    (d,) = tables(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_w = Window.partitionBy("tok")
    scored = tf.select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs))
                                / F.count("*").over(df_w)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "tok", "score")
    )


def sessionize(df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Assign per-key session ids by the gap rule: a new session starts
    when the time since the previous event strictly exceeds
    ``gap_seconds`` (exact microsecond arithmetic — truncating to whole
    seconds misclassifies fractional-second boundary gaps). Two window
    passes over one shuffle on ``key_col``; ties on the timestamp share
    a session regardless of tie order."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    w2 = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = gap_seconds * 1_000_000
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.expr(f"unix_micros(cast({ts_col} AS timestamp)) - "
                  f"unix_micros(cast(lag({ts_col}) OVER "
                  f"(PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})"
                  f" AS timestamp))")
           > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn("_new_sess", new_sess).withColumn(
        "sess_id", F.sum("_new_sess").over(w2)
    ).drop("_new_sess")


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, value,
             cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) as bigint) AS sess_id
      FROM g
    )
    SELECT user_id, sess_id, count(*) AS n_events,
           round(cast(sum(cast(value AS decimal(30,8))) AS double), 6)
             AS sess_value
    FROM s GROUP BY user_id, sess_id
    """,
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min-gap rule via lag + running sum of
    session starts (the classic two-window idiom; the streaming dual is
    evt_session_window). Both windows share the user_id partitioning —
    one shuffle, two window passes, then a map-side-combinable
    aggregate on the same keys."""
    (e,) = tables(spark, sf_dir, "events")
    s = sessionize(e.select("user_id", "ts", "value", "event_id"),
                   "user_id", "ts", "event_id")
    return s.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double"), 6
        ).alias("sess_value"),
    )


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT lang, count(*) AS n_sampled,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents
    WHERE ((doc_id % 1000000007) * 2654435761) % 100 < 10
    GROUP BY lang
    """,
    tags=("sampling",),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% stratified sample via multiplicative hashing
    on the key (Knuth's 2654435761; the id is reduced mod 1e9+7 first
    so the product never overflows int64 under ANSI mode at any id
    scale). Unlike sample()/TABLESAMPLE this is
    reproducible across engines, partitionings, and reruns — the
    property a 100 TB curation pipeline needs for auditable subsets.
    Pure filter: pushes to the scan, no shuffle before the aggregate."""
    (d,) = tables(spark, sf_dir, "documents")
    return (
        d.where(((F.col("doc_id") % 1000000007) * 2654435761) % 100 < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "scalar_try",
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderstatus AS bigint)               AS bad_int,
           try_cast(cast(o_orderkey AS varchar) AS bigint) AS good_int,
           strftime(try_cast('2026-02-30' AS date), '%Y-%m-%d') AS bad_date,
           round(o_totalprice / nullif(o_custkey, 0), 6)   AS safe_div,
           ([10,20,30])[o_orderkey % 5 + 1]                AS maybe_elem
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("scalar", "try"),
)
def scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family: try_cast (bad string/date -> NULL
    instead of ANSI error), try_divide (NULL on zero divisor), and
    try_element_at (NULL past the end). DuckDB spells the last two
    nullif-division and native out-of-bounds list indexing — semantics
    align exactly. These are the expressions a 100 TB pipeline wants:
    one malformed row must never kill a 1000-executor stage."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.expr("try_cast(o_orderstatus AS bigint)").alias("bad_int"),
        F.expr("try_cast(cast(o_orderkey AS string) AS bigint)").alias("good_int"),
        # date values are formatted to strings: Spark's DateType lands in
        # pandas as object(datetime.date) vs DuckDB's datetime64 — the
        # driver hash sees different value reprs even for equal dates
        F.date_format(F.expr("try_cast('2026-02-30' AS date)"), "yyyy-MM-dd")
         .alias("bad_date"),
        F.round(F.expr("try_divide(o_totalprice, o_custkey)"), 6).alias("safe_div"),
        F.expr("try_element_at(array(10, 20, 30), "
               "cast(o_orderkey % 5 + 1 AS int))").alias("maybe_elem"),
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           cast(json_extract(props, '$.k') AS bigint)  AS k_int,
           cast(json_extract(props, '$.k') AS varchar) IS NOT NULL AS has_k,
           json_extract(props, '$.missing') IS NULL    AS no_missing
    FROM events WHERE event_id < 1000
    """,
    tags=("scalar", "variant"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once, then typed variant_get paths — the open-format
    answer to schemaless records (the reference's map[string]interface{}
    rows, SURVEY §1.2, land naturally as VARIANT at ingest). DuckDB
    oracle uses its JSON extraction; outputs are typed ints/bools so
    parity is exact. At scale VARIANT beats JSON strings: binary-encoded,
    shreddable, and path access prunes instead of re-parsing text."""
    (e,) = tables(spark, sf_dir, "events")
    return e.where(F.col("event_id") < 1000).select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.k', 'string') IS NOT NULL")
            .alias("has_k"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string') IS NULL")
            .alias("no_missing"),
    )


@query(
    "scalar_collation",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE lower(o_orderpriority) = '1-urgent'
       OR lower(o_orderpriority) = '5-low'
    GROUP BY o_orderpriority
    """,
    tags=("scalar", "collation"),
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive comparison via Spark 4 collations
    (UTF8_LCASE) instead of wrapping every predicate in lower() —
    collation-aware comparison keeps the column's stats usable for
    pruning where a lower() expression would defeat them. Oracle
    spells the same predicate with lower(); the grouping key is the
    raw column on both sides so output parity is exact."""
    (o,) = tables(spark, sf_dir, "orders")
    return (
        o.where(
            (F.expr("o_orderpriority COLLATE UTF8_LCASE") == "1-URGENT")
            | (F.expr("o_orderpriority COLLATE UTF8_LCASE") == "5-LOW")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "window_moving_stats",
    oracle="""
    SELECT event_id, user_id,
           round(cast(sum(cast(value AS decimal(30,8)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                      AS double)
                 / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
             AS mavg4,
           last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_id,
           round(value * 100
                 / nullif(cast(sum(cast(value AS decimal(30,8)))
                               OVER (PARTITION BY user_id) AS double), 0), 6)
             AS pct_of_user
    FROM events WHERE user_id < 50
    """,
    tags=("window", "frame"),
)
def window_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame window suite: 4-row moving average (exact decimal
    sum / frame count — never avg() over doubles), last non-null
    carry-forward (IGNORE NULLS: 'most recent purchase id as of each
    event'), and percent-of-total over an unframed partition window.
    All three share one user_id shuffle; frames are linear per-key
    scans, so cost is one pass regardless of frame width.

    pct_of_user is NULL when the user's total value is exactly 0
    (single zero-value event, or negatives canceling) — nullif on
    both sides; registry-fuzz finding (ANSI DIVIDE_BY_ZERO)."""
    (e,) = tables(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w4 = (Window.partitionBy("user_id").orderBy(*order).rowsBetween(-3, 0))
    wcum = (Window.partitionBy("user_id").orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("user_id")
    dsum4 = F.sum(F.col("value").cast("decimal(30,8)")).over(w4).cast("double")
    return e.where(F.col("user_id") < 50).select(
        "event_id",
        "user_id",
        F.round(dsum4 / F.count("*").over(w4), 6).alias("mavg4"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("event_id")),
            ignorenulls=True,
        ).over(wcum).alias("last_purchase_id"),
        F.round(
            F.col("value") * 100
            / F.nullif(
                F.sum(F.col("value").cast("decimal(30,8)")).over(wall)
                 .cast("double"),
                F.lit(0.0)),
            6,
        ).alias("pct_of_user"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT event_id,
                      CASE WHEN event_id % 7 = 0 THEN NULL
                           ELSE event_id % 5 END AS k
               FROM events WHERE event_id < 200),
         b AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE o_orderkey % 5 END AS k
               FROM orders WHERE o_orderkey < 50)
    SELECT a.event_id, b.o_orderkey, a.k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics a keyed
    merge of optional attributes needs. <=> stays a hash-joinable
    equality (Catalyst plans BHJ/SMJ on the coalesced key), unlike an
    OR-of-IS-NULLs rewrite which degrades to nested-loop."""
    (e,) = tables(spark, sf_dir, "events")
    (o,) = tables(spark, sf_dir, "orders")
    a = e.where(F.col("event_id") < 200).select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
         .otherwise(F.col("event_id") % 5).alias("k"))
    b = o.where(F.col("o_orderkey") < 50).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
         .otherwise(F.col("o_orderkey") % 5).alias("k"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        "event_id", "o_orderkey", a["k"].alias("k"))


@query(
    "agg_bool_conditional",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_high,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 99) AS any_gt99,
           count(DISTINCT CASE WHEN value > 50 THEN user_id END) AS users_high
    FROM events GROUP BY event_type
    """,
    tags=("agg", "bool"),
)
def agg_bool_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: filtered count (count_if),
    every/any quantifiers, and conditional distinct-count — all
    map-side-combinable single-bit or small-state aggregates, the
    cheapest possible shuffles at scale."""
    (e,) = tables(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("count_if(value > 50)").alias("n_high"),
        F.expr("every(value >= 0)").alias("all_nonneg"),
        F.expr("any(value > 99)").alias("any_gt99"),
        F.countDistinct(
            F.when(F.col("value") > 50, F.col("user_id"))).alias("users_high"),
    )


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
    SELECT least(coalesce(cast(floor((value - lo)
                                     / nullif((hi - lo) / 10, 0)) AS bigint),
                          0), 9)
             AS bucket,
           count(*) AS n,
           round(min(value), 6) AS bucket_min,
           round(max(value), 6) AS bucket_max
    FROM events CROSS JOIN b
    GROUP BY bucket
    """,
    tags=("agg", "histogram", "profile"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 10-bucket histogram: bounds from one aggregate pass
    broadcast as a 1-row cross join, bucketing as pure arithmetic on
    the second pass (identical float ops both engines; the max value
    clamps into the last bucket). Two scans total — at 100 TB the
    first pass can reuse parquet column stats instead (min/max from
    footer metadata, making it one scan).

    Degenerate range (every value identical, hi == lo) puts all rows
    in bucket 0 on both sides: the NULL width is coalesced to bucket 0
    BEFORE the least() clamp — both engines' least() SKIPS nulls, so
    the previous coalesce-outside-least silently sent degenerate rows
    to bucket 9 (round-7 advice). Registry-fuzz finding: the raw
    width division raised ANSI DIVIDE_BY_ZERO on an all-equal (or
    single-row) corpus."""
    (e,) = tables(spark, sf_dir, "events")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = F.nullif((F.col("hi") - F.col("lo")) / 10, F.lit(0.0))
    return (
        e.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.coalesce(
                    F.floor((F.col("value") - F.col("lo")) / width)
                     .cast("bigint"),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(9),
            ).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("bucket_min"),
            F.round(F.max("value"), 6).alias("bucket_max"),
        )
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*) AS n,
           round(cast(sum(cast(value AS decimal(30,8))) AS double), 6)
             AS total_value
    FROM events GROUP BY ALL
    """,
    tags=("agg", "sql-sugar"),
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 / modern-SQL sugar): non-aggregate select
    items become the grouping key implicitly — same plan as the
    explicit form (one partial+final hash aggregate), proven by the
    shared oracle."""
    (e,) = tables(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql("""
        SELECT event_type, user_id % 10 AS user_bucket,
               count(*) AS n,
               round(cast(sum(cast(value AS decimal(30,8))) AS double), 6)
                 AS total_value
        FROM events GROUP BY ALL
    """)


@query(
    "text_bm25_search",
    oracle="""
    WITH dl AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             x -> x <> '')) AS dl
      FROM documents
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents) t
      WHERE tok IN ('spark', 'query', 'join')
      GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY tok
    ), contrib AS (
      SELECT tf.doc_id,
             cast(round(
               ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                    / (cast(stats.sum_dl AS double) / stats.n)))
               * 1e6, 0) AS bigint) AS c
      FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, cast(sum(c) AS bigint) AS score_e6
    FROM contrib GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id LIMIT 20
    """,
    tags=("text", "search"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 for the query
    ``spark query join`` — the ranking function every retrieval
    pipeline (and RAG corpus curation) runs over a text corpus.

    Determinism: each per-term contribution is rounded to integer
    micro-units BEFORE the per-doc sum, so the score is an exact
    BIGINT in both engines — float summation order cannot flip ranks
    (the registry's scaled-integer policy; ln() ulp drift is absorbed
    by the 1e-6 quantum, the same exposure tfidf_top_terms carries).

    Scale shape: ONE tokenize pass; the explode is filtered to the
    query terms immediately (predicate inside the same stage as the
    scan, so the shuffled tf set is only docs containing query terms);
    dl rides the token rows (max aggregate) instead of a second
    corpus-wide join; document frequency and corpus stats are
    broadcast one-row/three-row dims. Final ordering is a
    TakeOrderedAndProject, never a global sort.
    """
    (d,) = tables(spark, sf_dir, "documents")
    terms = ["spark", "query", "join"]
    base = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "),
                 lambda x: x != "").alias("toks"),
    ).select("doc_id", F.size("toks").alias("dl"), "toks")

    stats = base.agg(F.count("*").alias("n"),
                     F.sum("dl").alias("sum_dl"))

    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .where(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))

    joined = (tf.join(F.broadcast(dfreq), "tok")
                .crossJoin(F.broadcast(stats)))
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log(F.lit(1) + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    c = (idf * (F.col("tf") * F.lit(2.2))
         / (F.col("tf") + F.lit(1.2)
            * (F.lit(1) - F.lit(0.75)
               + F.lit(0.75) * F.col("dl") / avgdl)))
    contrib = joined.select(
        "doc_id", F.round(c * F.lit(1e6), 0).cast("long").alias("c"))
    return (contrib.groupBy("doc_id").agg(F.sum("c").alias("score_e6"))
            .orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(20))
