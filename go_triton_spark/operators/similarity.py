"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact top-k cosine neighbors — the baseline
  and the oracle-checkable primitive (deterministic double folds +
  rounded scores + total-order ranking).
- ``ann_topk_lsh``: sign-random-projection bucketed variant — the
  100 TB path (candidates from matching hyperplane-sign bands, exact
  re-scoring of candidates only). Approximate recall -> rows-only
  check; structure (k rows per query, ordered) is asserted in tests.

All vector math is built-in higher-order functions (zip_with /
aggregate) — JVM-side, no Python UDF in the scoring loop.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

_DIM = 64
_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors

_DOT = ("aggregate(zip_with(q_emb, n_emb, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)")
_NQ = ("aggregate(transform(q_emb, x -> cast(x as double) * cast(x as double)), "
       "cast(0.0 as double), (acc, v) -> acc + v)")
_NN = ("aggregate(transform(n_emb, x -> cast(x as double) * cast(x as double)), "
       "cast(0.0 as double), (acc, v) -> acc + v)")


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
    n AS (SELECT vec_id AS neighbor_id, embedding AS n_emb FROM embeddings),
    s AS (
      SELECT q.query_id, n.neighbor_id,
             round(
               (SELECT sum(cast(q.q_emb[i] as double) * cast(n.n_emb[i] as double)
                           ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
               / sqrt(
                 (SELECT sum(cast(q.q_emb[i] as double) * cast(q.q_emb[i] as double)
                             ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
                 * (SELECT sum(cast(n.n_emb[i] as double) * cast(n.n_emb[i] as double)
                               ORDER BY i) FROM generate_series(1, {_DIM}) t(i))),
               6) AS score
      FROM q CROSS JOIN n WHERE q.query_id != n.neighbor_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s) t
    WHERE rank <= {_K}
    """,
    tags=("llm", "similarity"),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against all vectors.

    Plan at scale: queries broadcast (no shuffle of the corpus), one
    narrow scoring pass, then the window top-k shuffles only
    (query, neighbor, score) rows. Scores rounded to 6 dp before
    ranking so both engines rank identical values; neighbor_id breaks
    ties.
    """
    (e,) = tables(spark, sf_dir, "embeddings")
    q = (e.where(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")))
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q).crossJoin(n)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(
            F.expr(_DOT) / F.sqrt(F.expr(_NQ) * F.expr(_NN)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _K)
            .select("query_id", "neighbor_id", "rank"))


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Rademacher (+/-1) hyperplanes — data-independent."""
    rng = random.Random(seed)
    return [[float(rng.choice((-1, 1))) for _ in range(dim)] for _ in range(n_planes)]


@query(
    "ann_topk_lsh",
    oracle=None,  # approximate recall — rows-only check (see docstring)
    tags=("llm", "similarity", "lsh"),
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via sign-random-projection LSH.

    32 bands x 4 hyperplanes: a corpus vector is a candidate for a
    query if any band's 4 sign bits all match. Candidates are exactly
    re-scored; output shape matches ann_topk_bruteforce (fewer rows
    possible if a bucket starves — that is the approximation).
    Band shape is tuned for LOW-similarity corpora (top neighbors here
    sit at cosine ~0.3-0.5): P(candidate | cos=0.4) ~ 0.99 at r=4,b=32
    vs ~0.33 at r=8,b=16. For near-dup thresholds (cos>=0.9) prefer
    r=8 bands — fewer candidates, same recall.

    No SQL oracle: recall < 1 by construction. The driver records the
    rows-only check; tests assert structure and recall >= 0.8 against
    the brute-force result at smoke scale.

    At 100 TB: the corpus is hashed once (narrow), bucketed
    (shuffle on 16-bit keys), and each query probes 16 buckets instead
    of scanning n vectors.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    (e,) = tables(spark, sf_dir, "embeddings")
    n_bands, rows_per_band = 32, 4
    planes = np.array(_hyperplanes(n_bands * rows_per_band, _DIM))  # (128, 64)

    sig_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.LongType()),
    ])

    def hash_batches(batches):
        # vectorized sign projection: (n,64) @ (64,128) -> sign bits ->
        # one packed key per band; emits narrow (vec, band, key) rows
        # (never the embedding — 32x replication of a 64-float array
        # through Arrow dominated this stage before)
        weights = 1 << np.arange(rows_per_band - 1, -1, -1, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(list(pdf["embedding"]), dtype=np.float64)
            bits = (emb @ planes.T >= 0).astype(np.int64)  # (n, 128)
            keys = bits.reshape(len(pdf), n_bands, rows_per_band) @ weights  # (n, 32)
            out = pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32), len(pdf)),
                "sig": keys.reshape(-1),
            })
            yield out

    # cached: the signature pass feeds both the query and corpus branches
    # of the bucket join (without cache the numpy pass + Python worker
    # round-trip runs twice)
    buckets = (e.select("vec_id", "embedding")
               .mapInPandas(hash_batches, schema=sig_schema)
               .cache())
    qb = (buckets.where(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("query_id"), "band", "sig"))
    nb = buckets.select(F.col("vec_id").alias("neighbor_id"), "band", "sig")
    cand = (
        F.broadcast(qb).join(nb, ["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # re-attach embeddings to candidates only, then numpy re-score
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    pairs = cand.join(F.broadcast(qe), "query_id").join(ne, "neighbor_id")

    score_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def rescore(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["q_emb"]), dtype=np.float64)
            n = np.array(list(pdf["n_emb"]), dtype=np.float64)
            dots = np.einsum("ij,ij->i", q, n)
            score = dots / np.sqrt((q * q).sum(1) * (n * n).sum(1))
            yield pd.DataFrame({"query_id": pdf["query_id"].to_numpy(),
                                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                                "score": np.round(score, 6)})

    scored = pairs.mapInPandas(rescore, schema=score_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _K)
            .select("query_id", "neighbor_id", "rank"))


@query(
    "ann_topk_ivf",
    oracle=None,  # approximate recall — rows-only check (see docstring)
    tags=("llm", "similarity", "ivf"),
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) cells.

    The corpus is partitioned into ``n_cells`` Voronoi cells around
    deterministic seed centroids (every (n/n_cells)-th vector by id —
    data-dependent but collect-bounded: n_cells * dim floats on the
    driver, constant at any corpus size). Each query probes its
    ``n_probe`` nearest cells; only those cells' vectors are exactly
    re-scored. Recall < 1 by construction -> rows-only driver check;
    tests assert recall >= 0.8 vs ann_topk_bruteforce.

    At 100 TB: cell assignment is one narrow numpy pass, the corpus
    shuffles once on (cell), and each query touches n_probe/n_cells of
    the data — the classic IVF latency/recall dial.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    (e,) = tables(spark, sf_dir, "embeddings")
    n_cells, n_probe = 16, 4

    total = e.count()
    step = max(total // n_cells, 1)
    cent_rows = (e.where((F.col("vec_id") % step == 0))
                 .orderBy("vec_id").limit(n_cells).collect())
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    assign_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
    ])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(list(pdf["embedding"]), dtype=np.float64)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            cell = np.argmax(emb @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "cell": cell})

    probe_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
    ])

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(list(pdf["embedding"]), dtype=np.float64)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            order = np.argsort(-(emb @ cents.T), axis=1)[:, :n_probe]
            yield pd.DataFrame({
                "query_id": np.repeat(pdf["vec_id"].to_numpy(), n_probe),
                "cell": order.reshape(-1).astype(np.int32)})

    cells = e.select("vec_id", "embedding").mapInPandas(assign, schema=assign_schema)
    probes = (e.where(F.col("vec_id") < _N_QUERIES)
              .select("vec_id", "embedding")
              .mapInPandas(probe, schema=probe_schema))
    cand = (
        F.broadcast(probes).join(cells, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    pairs = cand.join(F.broadcast(qe), "query_id").join(ne, "neighbor_id")

    score_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def rescore(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["q_emb"]), dtype=np.float64)
            n = np.array(list(pdf["n_emb"]), dtype=np.float64)
            dots = np.einsum("ij,ij->i", q, n)
            score = dots / np.sqrt((q * q).sum(1) * (n * n).sum(1))
            yield pd.DataFrame({"query_id": pdf["query_id"].to_numpy(),
                                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                                "score": np.round(score, 6)})

    scored = pairs.mapInPandas(rescore, schema=score_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _K)
            .select("query_id", "neighbor_id", "rank"))


@query(
    "emb_centroids",
    oracle="""
    WITH e AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding) AS v
      FROM embeddings
    ), c AS (
      SELECT label, pos,
             round(cast(sum(cast(v AS decimal(30,8))) AS double) / count(*), 6)
               AS cv
      FROM e GROUP BY label, pos
    )
    SELECT cast(label as bigint) AS label,
           string_agg(printf('%.6f', cv), '|' ORDER BY pos) AS centroid,
           count(*) AS dim
    FROM c GROUP BY label
    """,
    tags=("llm", "similarity", "vector"),
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the vector-average primitive
    under IVF training, cluster drift monitoring, and class
    prototypes). Dimensions explode to (label, pos, v) rows so the
    mean is an ordinary map-side-combinable aggregate — exact decimal
    sums make it partitioning-independent — then each centroid
    reassembles via a struct-sorted collect_list. Shuffle carries
    (label, pos) pairs: dim × n_labels cardinality, independent of
    corpus size."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(30,8)")).cast("double")
                / F.count("*"),
                6,
            ).alias("cv")
        )
    )
    # centroid is emitted as a '|'-joined fixed-format string: array-typed
    # result columns crash the driver's canonical sort, and float->string
    # default reprs differ across engines (%.6f is identical in both).
    return per_dim.groupBy("label").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, cv))), "
                   "x -> format_string('%.6f', x.cv))"),
            "|",
        ).alias("centroid"),
        F.count("*").alias("dim"),
    )
