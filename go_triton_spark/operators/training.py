"""Training-data assembly operators: the last mile of an LLM pipeline.

After dedup/curation (dedup.py, curation.py) a corpus still needs to be
turned into training input: split into train/val/test reproducibly,
rebalanced across languages, and packed into fixed-length context
windows. Each operator here is deterministic (hash/integer math only in
the decisions), expressed as built-in DataFrame ops, and oracle-twinned
in DuckDB.

Scale stance (100 TB):
- the split is a pure projection/filter — pushes to the scan, no
  shuffle, no state;
- language balancing aggregates per-lang counts (a few rows), derives
  integer targets driver-free via a broadcast join, and keeps docs with
  one window per language — a single shuffle on lang;
- sequence packing is a per-language running sum (one shuffle on lang,
  then a linear scan per partition) — the global-concat variant would
  serialize on one cumsum, so the pack unit IS the parallel unit, the
  same trade every distributed tokenizer pipeline makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

# Knuth multiplicative hash — the repo's portable deterministic-hash
# idiom (same as sample_stratified_hash): identical integer math in
# Spark and DuckDB, reproducible across engines/partitionings/reruns.
# The id is reduced mod 1e9+7 BEFORE the multiply so the product stays
# under 2^63 for ANY doc_id (ANSI mode — Spark 4 default — THROWS on
# int64 overflow; an unbounded multiply works at test scale and dies
# at 100 TB ids ~1e10).
_KNUTH = 2654435761
_HMOD = 1000000007

_PACK_WINDOW = 512        # context length in whitespace tokens
_BALANCE_TARGET = 300     # total docs the balanced corpus should keep


@query(
    "curate_train_val_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN ((doc_id % {_HMOD}) * {_KNUTH}) % 100 < 90 THEN 'train'
                WHEN ((doc_id % {_HMOD}) * {_KNUTH}) % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("llm", "curation", "split"),
)
def curate_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by multiplicative
    hash of the document id — reproducible across engines, reruns, and
    repartitioning (what sample()/rand() cannot give an auditable
    pipeline). Pure projection: no shuffle, pushes to the scan;
    disjointness/exhaustiveness asserted in test_llm_ops.py."""
    (d,) = tables(spark, sf_dir, "documents")
    bucket = ((F.col("doc_id") % _HMOD) * _KNUTH) % 100
    return d.select(
        "doc_id", "lang",
        F.when(bucket < 90, "train")
         .when(bucket < 95, "val")
         .otherwise("test").alias("split"))


@query(
    "curate_language_balance",
    oracle=f"""
    WITH n AS (
      SELECT lang, count(*) AS n_docs,
             cast(round(sqrt(count(*)) * 1000000) as bigint) AS w
      FROM documents GROUP BY lang),
    t AS (
      SELECT lang, n_docs,
             ({_BALANCE_TARGET} * w) // (SELECT sum(w) FROM n) AS n_target
      FROM n),
    r AS (
      SELECT d.doc_id, d.lang,
             row_number() OVER (PARTITION BY d.lang
                                ORDER BY ((d.doc_id % {_HMOD}) * {_KNUTH}) % {_HMOD},
                                         d.doc_id) AS rn
      FROM documents d)
    SELECT r.doc_id, r.lang
    FROM r JOIN t USING (lang)
    WHERE r.rn <= t.n_target
    """,
    tags=("llm", "curation", "sampling"),
)
def curate_language_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-style language rebalancing (alpha = 0.5): language
    l keeps ``floor(TARGET * sqrt(n_l) / sum sqrt(n))`` documents,
    chosen in deterministic hash order — flattens the head languages
    while keeping tail languages represented, the standard multilingual
    pretraining recipe. Weights are scaled-integer (round(sqrt*1e6))
    so the target arithmetic is order-free exact integer math in both
    engines (sqrt is IEEE correctly-rounded, identical everywhere; a
    float SUM of weights would be summation-order-dependent).

    At 100 TB: per-lang counts are a map-side-combined aggregate (rows
    = languages), targets broadcast back, and selection is one window
    per language — a single shuffle of (doc_id, lang, hash)."""
    (d,) = tables(spark, sf_dir, "documents")
    n = (d.groupBy("lang").agg(F.count("*").alias("n_docs"))
         .withColumn("w", F.round(F.sqrt("n_docs") * 1e6).cast("long")))
    # total weight via a window over the per-lang rows (cardinality =
    # languages) — stays in-plan, no collect, and no second aggregation
    # branch rescanning documents
    t = (n.withColumn("w_sum", F.sum("w").over(Window.partitionBy()))
         .select("lang",
                 F.expr(f"{_BALANCE_TARGET} * w div w_sum").alias("n_target")))
    wlang = Window.partitionBy("lang").orderBy(
        ((F.col("doc_id") % _HMOD) * _KNUTH) % _HMOD, F.col("doc_id"))
    return (d.select("doc_id", "lang")
            .withColumn("rn", F.row_number().over(wlang))
            .join(F.broadcast(t), "lang")
            .where(F.col("rn") <= F.col("n_target"))
            .select("doc_id", "lang"))


@query(
    "text_sequence_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             cast(coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               as bigint) AS tok_start
      FROM toks)
    SELECT doc_id, lang, n_tokens, tok_start,
           cast(tok_start // {_PACK_WINDOW} as bigint)    AS seq_first,
           cast((tok_start + n_tokens - 1) // {_PACK_WINDOW} as bigint)
                                                          AS seq_last
    FROM c
    """,
    tags=("llm", "text", "packing"),
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated
    in id order per language and sliced into fixed {PACK_WINDOW}-token
    training sequences (the GPT-style packing recipe — a document may
    span sequences; seq_first/seq_last delimit it, tok_start is its
    offset in the language's token stream).

    The running sum partitions BY LANGUAGE deliberately: a single
    global token stream would put every row behind one sequential
    cumsum; per-language streams give shuffle-once parallelism with
    the same training semantics (packing never mixes languages here).
    At higher cardinality, any corpus sharding key works the same way.
    """
    (d,) = tables(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang",
                    F.size(F.split("text", " ")).alias("n_tokens"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    c = toks.withColumn(
        "tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        "doc_id", "lang", "n_tokens", "tok_start",
        F.expr(f"tok_start div {_PACK_WINDOW}").alias("seq_first"),
        F.expr(f"(tok_start + n_tokens - 1) div {_PACK_WINDOW}")
         .alias("seq_last"))


_MIX_BUDGET = 100_000     # token budget the mixture must sum to


@query(
    "curate_mix_weights",
    oracle=f"""
    WITH tok AS (
      SELECT lang, source,
             count(*) AS n_docs,
             cast(sum(len(list_filter(string_split(text, ' '),
                                      w -> w <> ''))) AS bigint) AS toks
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT cast(sum(toks) AS bigint) AS t FROM tok
    ), base AS (
      SELECT lang, source, n_docs, toks, t,
             ({_MIX_BUDGET} * toks) // nullif(t, 0) AS alloc_floor,
             ({_MIX_BUDGET} * toks) % nullif(t, 0) AS rem
      FROM tok, tot
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rk,
             cast({_MIX_BUDGET} - sum(alloc_floor) OVER () AS bigint)
               AS leftover
      FROM base
    )
    SELECT lang, source, n_docs, toks,
           cast(CASE WHEN t = 0 THEN 0
                     ELSE alloc_floor
                          + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                END AS bigint) AS alloc_tokens
    FROM ranked
    """,
    tags=("llm", "curation", "training"),
)
def curate_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weighting: allocate a fixed training token budget
    across (lang, source) groups proportionally to their token mass,
    using largest-remainder (Hamilton) apportionment so the allocations
    are integers that sum EXACTLY to the budget — the deterministic
    skeleton of the mixing step every pretraining run performs before
    sampling (temperature/DoReMi reweighting plugs in by replacing the
    proportional share; the integer apportionment stays).

    All decisions are int64 arithmetic (floor-div + remainder rank), so
    the result is bit-identical cross-engine and rerun-stable. Plan:
    one map-side-combinable aggregate reduces the corpus to one row per
    group; the window apportionment runs on that tiny table (a few
    hundred rows even at 100 TB — group count, not corpus size, bounds
    it). Budget*toks stays under 2^63 for corpora up to ~9e13 tokens at
    this budget; raise to decimal if both grow.

    A corpus with ZERO total tokens (every doc empty/whitespace) has
    no proportional shares to apportion — the contract is alloc 0 for
    every group, never a spread of the budget over token-less groups.
    nullif keeps the div/mod NULL-safe under ANSI mode and the final
    CASE pins the zero (registry-fuzz finding: DIVIDE_BY_ZERO on an
    all-empty-text corpus)."""
    (d,) = tables(spark, sf_dir, "documents")
    tok = (d.select(
        "lang", "source",
        F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
         .cast("long").alias("ntok"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("ntok").alias("toks")))
    tot = tok.withColumn("t", F.sum("toks").over(Window.partitionBy()))
    base = tot.select(
        "lang", "source", "n_docs", "toks", "t",
        F.expr(f"({_MIX_BUDGET} * toks) div nullif(t, 0)")
         .alias("alloc_floor"),
        F.expr(f"({_MIX_BUDGET} * toks) % nullif(t, 0)").alias("rem"))
    ranked = (base
              .withColumn("rk", F.row_number().over(
                  Window.orderBy(F.desc("rem"), F.asc("lang"),
                                 F.asc("source"))))
              .withColumn("leftover",
                          F.lit(_MIX_BUDGET)
                          - F.sum("alloc_floor").over(Window.partitionBy())))
    return ranked.select(
        "lang", "source", "n_docs", "toks",
        F.when(F.col("t") == 0, F.lit(0))
         .otherwise(
            F.col("alloc_floor")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
         .cast("long").alias("alloc_tokens"))
