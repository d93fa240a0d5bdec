"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact top-k cosine neighbors — the baseline
  and the oracle-checkable primitive (deterministic double folds +
  rounded scores + total-order ranking).
- ``ann_topk_lsh``: sign-projection bucketed variant — the 100 TB
  path (candidates from matching sign-bit bands, exact re-scoring of
  candidates only). The banding is deterministic column arithmetic,
  so the DuckDB oracle replicates the algorithm exactly and the
  driver hash-checks it; recall vs the true top-k is a test assert.

All vector math is built-in higher-order functions (zip_with /
aggregate) — JVM-side, no Python UDF in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import local_df, query, tables

_DIM = 64
_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors

_DOT = ("aggregate(zip_with(q_emb, n_emb, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)")

# per-vector squared norm over the raw embedding column — computed
# ONCE per vector instead of re-folded per candidate pair
# (bit-identical values, so oracles are unchanged). Kept as the HOF
# fold on purpose: a measured experiment with a flat 64-term unrolled
# sum (whole-stage-codegen arithmetic) was 6x SLOWER than the fold —
# the generated method blows past the JIT's huge-method limit and the
# stage runs un-JIT-ed (rescore 3.6s vs 0.6s on 1.3M pairs). r12
# drops the inner transform() layer: folding the squares directly
# accumulates the same doubles in the same order (bit-identical,
# asserted over the corpus) while skipping one interpreted lambda
# pass and one boxed array allocation per vector — measured 0.84x
# cpu on a 2M-row controlled A/B of the fold alone.
_SELF_N2 = ("aggregate(embedding, cast(0.0 as double), "
            "(acc, x) -> acc + cast(x as double) * cast(x as double))")


def _exact_pair_scores(spark: SparkSession, cand: DataFrame, e: DataFrame,
                       a_col: str, b_col: str,
                       broadcast_a: bool = False,
                       pre_partitioned: bool = False) -> DataFrame:
    """Exact cosine rescore of a candidate-pair table.

    ``pre_partitioned=True``: the caller already issued the explicit
    repartition on a_col (e.g. _capped_pairs folds it into its dedup),
    so repeating it here would add a pointless second shuffle of the
    pair table.

    Two deliberate plan choices, both for the compute-dense HOF pass:
    (1) squared norms are computed once per VECTOR and joined in as
    scalar columns — the per-pair work drops from three interpreted
    array folds to one (the dot product; measured 2.4x on 1.3M
    pairs); values are bit-identical to folding inline, so the DuckDB
    oracles need no change. (2) the pair
    table is explicitly repartitioned (user-specified partition count
    on a_col — NOT collapsible into the upstream distinct's exchange,
    and AQE never coalesces an explicit-count repartition) before the
    joins: AQE coalesces ENSURE_REQUIREMENTS shuffles by BYTES, and a
    few million (id, id) pairs look tiny while carrying seconds-to-
    minutes of interpreted-expression work — the explicit width keeps
    the pair table wide entering the join stages here AND at cluster
    scale (where the same byte-blindness applies). What the a_col pin
    guarantees precisely: the qe join runs at that width, and when the
    planner broadcasts ne (any time it measures small, which includes
    every local SF), the dot-product projection does too. When ne is
    instead shuffle-joined (cluster scale), the b_col exchange that
    join introduces re-partitions the pairs — at that point the pairs
    carry real bytes (two dense vectors each), so AQE's byte-based
    coalescing sees their true weight and keeps them wide without help.
    The caller's per-a_col window/distinct then adds its own exchange
    over the narrow (a, b, score) rows — cheap by construction."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    qe = e.select(F.col("vec_id").alias(a_col),
                  F.col("embedding").alias("q_emb"),
                  F.expr(_SELF_N2).alias("q_n2"))
    if broadcast_a:
        qe = F.broadcast(qe)
    ne = e.select(F.col("vec_id").alias(b_col),
                  F.col("embedding").alias("n_emb"),
                  F.expr(_SELF_N2).alias("n_n2"))
    if not pre_partitioned:
        cand = cand.repartition(nparts, F.col(a_col))
    return (cand
            .join(qe, a_col).join(ne, b_col)
            .withColumn("score", F.round(
                F.expr(_DOT) / F.sqrt(F.col("q_n2") * F.col("n_n2")), 6)))


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
    # norms factored out of the cross join (r12): folded once per
    # vector instead of twice per (query, neighbor) pair — the same
    # doubles reach the sqrt, so scores are bit-identical and the
    # oracle is unchanged; the per-pair work drops from three
    # interpreted folds to one (the dot).
    q = (e.where(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.expr(_SELF_N2).alias("q_n2")))
    n = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("n_emb"),
                 F.expr(_SELF_N2).alias("n_n2"))
    scored = (
        F.broadcast(q).crossJoin(n)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(
            F.expr(_DOT) / F.sqrt(F.col("q_n2") * F.col("n_n2")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _K)
            .select("query_id", "neighbor_id", "rank"))


# --- sign-projection banding, shared between Spark and the oracle ----
# Band b packs the sign bits of ``rows`` coordinates starting at offset
# stride*b, wrapping at dim. Axis-aligned sign projections are a
# degenerate-but-valid SRP family; crucially they are PURE COLUMN
# ARITHMETIC, so DuckDB can replicate the bucketing bit-for-bit and the
# driver gets a full rows+schema+hash check of the exact algorithm
# (candidates -> exact rescore/verify) rather than a rows-only pass.
# Overlapping windows trade band independence for band count; the gate
# never depends on the (approximate) recall math because the oracle is
# the algorithm twin — recall is asserted separately in tests.
_LSH_BANDS_ANN = 32
_LSH_ROWS_ANN = 4


def _sign_band_indices(band: int, rows: int, stride: int,
                       dim: int = _DIM) -> list[int]:
    """0-based embedding indices feeding one band's sign bits."""
    return [(stride * band + r) % dim for r in range(rows)]


def _sign_sig_sql(one_based_col: str, band: int, rows: int, stride: int,
                  dim: int = _DIM) -> str:
    """Packed sign-bit key for one band; valid Spark SQL AND DuckDB SQL
    (element access is spelled by the caller via one_based_col % d)."""
    terms = [
        f"(CASE WHEN {one_based_col % (i + 1)} >= 0 THEN {1 << (rows - 1 - r)} ELSE 0 END)"
        for r, i in enumerate(_sign_band_indices(band, rows, stride, dim))
    ]
    return " + ".join(terms)


def _ann_sig_sql(one_based_col: str, band: int) -> str:
    return _sign_sig_sql(one_based_col, band, _LSH_ROWS_ANN, 2)


def _ann_oracle() -> str:
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_ann_sig_sql('embedding[%d]', b)} AS sig "
        f"FROM embeddings"
        for b in range(_LSH_BANDS_ANN))
    return f"""
    WITH sig AS ({sig_rows}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
      FROM sig q JOIN sig n ON q.band = n.band AND q.sig = n.sig
      WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> n.vec_id),
    s AS (
      SELECT c.query_id, c.neighbor_id,
             round(
               (SELECT sum(cast(q.embedding[i] as double) * cast(n.embedding[i] as double)
                           ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
               / sqrt(
                 (SELECT sum(cast(q.embedding[i] as double) * cast(q.embedding[i] as double)
                             ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
                 * (SELECT sum(cast(n.embedding[i] as double) * cast(n.embedding[i] as double)
                               ORDER BY i) FROM generate_series(1, {_DIM}) t(i))),
               6) AS score
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s) t
    WHERE rank <= {_K}
    """


@query(
    "ann_topk_lsh",
    oracle=_ann_oracle(),
    tags=("llm", "similarity", "lsh"),
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via sign-projection LSH banding.

    32 bands x 4 sign bits (overlapping coordinate windows, stride 2):
    a corpus vector is a candidate for a query iff some band's 4 sign
    bits all match; candidates are exactly re-scored and ranked. The
    banding is deterministic column arithmetic, so the DuckDB oracle
    replicates the ALGORITHM exactly (same candidates, same rescoring,
    same total-order ranking) and the driver hash-checks it fully;
    recall vs the true top-k (ann_topk_bruteforce) is asserted >= 0.8
    in test_llm_ops.py — the approximation lives there, not in the
    oracle comparison.

    At 100 TB: the corpus is hashed once (narrow JVM projection, no
    Python), bucketed (shuffle on small (band, sig) keys), and each
    query probes 32 buckets instead of scanning n vectors; only
    candidates pay the exact 64-dim rescore.
    """
    (e,) = tables(spark, sf_dir, "embeddings")
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'sig', "
        + _ann_sig_sql("element_at(embedding, %d)", b) + ")"
        for b in range(_LSH_BANDS_ANN))
    # the signature table feeds both the query and corpus branches;
    # the two sign-hash passes stay codegen-pipelined — measured
    # cheaper locally than a cache barrier (persist at cluster scale
    # if the embedding scan dominates)
    buckets = (e.select(
        "vec_id",
        F.explode(F.expr(f"array({band_structs})")).alias("bk"))
        .select("vec_id", F.col("bk.band").alias("band"),
                F.col("bk.sig").alias("sig")))
    qb = (buckets.where(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("query_id"), "band", "sig"))
    nb = buckets.select(F.col("vec_id").alias("neighbor_id"), "band", "sig")
    cand = (
        F.broadcast(qb).join(nb, ["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # exact rescore of candidates only — same JVM fold as bruteforce
    scored = _exact_pair_scores(spark, cand, e, "query_id", "neighbor_id",
                                broadcast_a=True)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _K)
            .select("query_id", "neighbor_id", "rank"))


_IVF_CELLS = 16
_IVF_PROBE = 4


def _ivf_oracle() -> str:
    """Algorithm-twin oracle for IVF: recomputes the deterministic seed
    centroids from the table, assigns cells, probes, and rescores with
    the same sequential fold order as the Spark side (sum ... ORDER BY
    i is the proven bit-exact twin of Spark's aggregate fold — same
    pattern as ann_topk_bruteforce)."""
    dot = ("(SELECT sum(cast({a}[i] as double) * cast({b}[i] as double) "
           f"ORDER BY i) FROM generate_series(1, {_DIM}) t(i))")
    return f"""
    WITH tot AS (SELECT count(*) AS n FROM embeddings),
    cents0 AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % (SELECT greatest(n // {_IVF_CELLS}, 1) FROM tot) = 0
      ORDER BY vec_id LIMIT {_IVF_CELLS}),
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM cents0),
    d AS (
      SELECT e.vec_id, c.cell,
             {dot.format(a='e.embedding', b='c.cv')}
             / sqrt({dot.format(a='e.embedding', b='e.embedding')}
                    * {dot.format(a='c.cv', b='c.cv')}) AS d
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
        FROM d) t WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
        FROM d WHERE vec_id < {_N_QUERIES}) t WHERE rn <= {_IVF_PROBE}),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell)
      WHERE a.vec_id <> p.query_id),
    s AS (
      SELECT c.query_id, c.neighbor_id,
             round({dot.format(a='q.embedding', b='n.embedding')}
                   / sqrt({dot.format(a='q.embedding', b='q.embedding')}
                          * {dot.format(a='n.embedding', b='n.embedding')}),
                   6) AS score
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s) t
    WHERE rank <= {_K}
    """


@query(
    "ann_topk_ivf",
    oracle=_ivf_oracle(),
    tags=("llm", "similarity", "ivf"),
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) cells.

    The corpus is partitioned into ``n_cells`` Voronoi cells around
    deterministic seed centroids (every (n/n_cells)-th vector by id —
    data-dependent but collect-bounded: n_cells * dim floats on the
    driver, constant at any corpus size). Each query probes its
    ``n_probe`` nearest cells; only those cells' vectors are exactly
    re-scored. All vector math is the JVM sequential fold (zip_with +
    aggregate), which the DuckDB oracle mirrors bit-for-bit with
    ordered sums — so the driver fully hash-checks the ALGORITHM
    (centroids -> assignment -> probe -> rescore -> top-k); recall vs
    the true top-k is asserted >= 0.5 in tests, where the
    approximation belongs.

    At 100 TB: cell assignment is n_cells narrow JVM dot products per
    vector, the corpus shuffles once on (cell), and each query touches
    n_probe/n_cells of the data — the classic IVF latency/recall dial.
    """
    (e,) = tables(spark, sf_dir, "embeddings")
    n_cells, n_probe = _IVF_CELLS, _IVF_PROBE

    total = e.count()
    step = max(total // n_cells, 1)
    cent_rows = (e.where((F.col("vec_id") % step == 0))
                 .orderBy("vec_id").limit(n_cells).collect())
    # LocalRelation, not createDataFrame: the Python-RDD scan the
    # latter plans re-pickles the centroid rows through Python workers
    # on every action (r12: ~7 cpu_s/action at local[32] for a literal
    # table); repr round-trip keeps every double bit-identical
    cents_df = local_df(
        spark,
        [(i, [float(x) for x in r["embedding"]])
         for i, r in enumerate(cent_rows)],
        [("cell", "int"), ("cv", "array<double>")])

    cdot = ("aggregate(zip_with(embedding, cv, (x, y) -> cast(x as double) * y), "
            "cast(0.0 as double), (acc, v) -> acc + v)")
    cnq = ("aggregate(embedding, cast(0.0 as double), "
           "(acc, x) -> acc + cast(x as double) * cast(x as double))")
    cnc = ("aggregate(cv, cast(0.0 as double), (acc, y) -> acc + y * y)")
    # norms factored OUT of the 16-way crossJoin: same fold, evaluated
    # once per vector / per centroid instead of once per (vector, cell)
    # pair — the d values are bit-identical (sqrt(nq*nc) sees the same
    # doubles), the interpreted-HOF work drops 16x.
    ev = e.select("vec_id", "embedding", F.expr(cnq).alias("nq"))
    cents_n = cents_df.withColumn("nc", F.expr(cnc))
    # the cell-distance table feeds both the assignment and the probe
    # branches; recomputing the dot pass twice stays codegen-pipelined
    # and measured cheaper locally than a cache barrier (persist at
    # cluster scale if the corpus scan dominates)
    d = (ev.crossJoin(F.broadcast(cents_n))
         .withColumn("d", F.expr(cdot) / F.sqrt(F.col("nq") * F.col("nc")))
         .select("vec_id", "cell", "d"))
    wv = Window.partitionBy("vec_id").orderBy(F.desc("d"), F.asc("cell"))
    ranked = d.withColumn("rn", F.row_number().over(wv))
    assign = ranked.where(F.col("rn") == 1).select("vec_id", "cell")
    probes = (ranked.where((F.col("vec_id") < _N_QUERIES)
                           & (F.col("rn") <= n_probe))
              .select(F.col("vec_id").alias("query_id"), "cell"))
    cand = (
        F.broadcast(probes).join(assign, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = _exact_pair_scores(spark, cand, e, "query_id", "neighbor_id",
                                broadcast_a=True)
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
    # default reprs differ across engines. %.6f is NOT universally
    # identical (Java formats HALF_UP, DuckDB printf rounds half-even:
    # a value exactly half at the 7th decimal, e.g. 0.0078125, would
    # format as .007813 vs .007812) — but cv is already round(...,6) on
    # BOTH sides, so the formatted double sits within ~1 ulp of a
    # 6-decimal value and the 7th-decimal-half case cannot arise from
    # the rounded input. Accepted residual risk: none for post-round
    # values; do not drop the inner round.
    return per_dim.groupBy("label").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, cv))), "
                   "x -> format_string('%.6f', x.cv))"),
            "|",
        ).alias("centroid"),
        F.count("*").alias("dim"),
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             cast(unnest(embedding) AS double) AS v
      FROM embeddings
    ), stats AS (
      SELECT pos, min(v) AS mn, max(v) AS mx FROM e GROUP BY pos
    ), q AS (
      SELECT vec_id, e.pos,
             cast(least(greatest(floor(
               CASE WHEN mx = mn THEN 0.0
                    ELSE (v - mn) * 255.0 / (mx - mn) END + 0.5), 0.0), 255.0)
               AS bigint) AS qv
      FROM e JOIN stats ON e.pos = stats.pos
    )
    SELECT vec_id, cast(sum(qv) AS bigint) AS q_checksum,
           string_agg(cast(qv AS varchar), '|' ORDER BY pos) AS q_codes
    FROM q GROUP BY vec_id
    """,
    tags=("llm", "similarity", "vector", "quantize"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension asymmetric int8 quantization (the storage/serving
    compression step of an embedding pipeline: 4x smaller vectors,
    and the code table an int8-SIMD ANN index consumes).

    Plan shape: one posexplode->groupBy(pos) partial aggregate reduces
    the corpus to dim rows of (min, max); those pack into two dim-length
    arrays broadcast to every task; quantization itself is a pure
    projection (`transform` with an index lambda) that never shuffles.
    At 100 TB the only shuffle moves dim x n_partitions partial rows —
    independent of corpus size — and the scan-to-codes pass is
    map-only, so this scales exactly like a filter.

    Determinism: code values are integers produced by floor(x + 0.5)
    on bit-identical IEEE double expressions ((v-mn)*255/(mx-mn),
    same association both engines), so the '|'-joined code string and
    checksum are hash-stable cross-engine (float->double widening is
    exact; no half-up-vs-half-even ambiguity because floor is used,
    not round)."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    stats = (emb.select(F.posexplode("embedding").alias("pos", "v"))
             .groupBy("pos")
             .agg(F.min(F.col("v").cast("double")).alias("mn"),
                  F.max(F.col("v").cast("double")).alias("mx")))
    # dim rows -> one row of two dim-length arrays, broadcast to all tasks
    packed = stats.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)")
        .alias("mn_arr"),
        F.expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)")
        .alias("mx_arr"))
    q_expr = (
        "transform(embedding, (x, i) -> cast(least(greatest(floor("
        "CASE WHEN element_at(mx_arr, i + 1) = element_at(mn_arr, i + 1) "
        "THEN 0.0D ELSE (cast(x AS double) - element_at(mn_arr, i + 1)) "
        "* 255.0D / (element_at(mx_arr, i + 1) - element_at(mn_arr, i + 1)) "
        "END + 0.5D), 0.0D), 255.0D) AS bigint))")
    return (emb.crossJoin(F.broadcast(packed))
            .withColumn("q_arr", F.expr(q_expr))
            .select(
                "vec_id",
                F.expr("aggregate(q_arr, 0L, (acc, v) -> acc + v)")
                .alias("q_checksum"),
                F.array_join(
                    F.expr("transform(q_arr, v -> cast(v AS string))"), "|")
                .alias("q_codes")))


# --- deterministic mini-batch-free Lloyd k-means ---------------------
# Exactly two Lloyd iterations (assign -> re-center -> assign), hand-
# unrolled below as c0 -> a1 -> c1 -> final assign; there is no
# iteration-count knob — adding passes means adding a stage per pass.
_KM_K = 4        # clusters; seeds are the k lowest vec_ids

_KM_DIST = (
    "round(aggregate(zip_with(embedding, c.vec, "
    "(x, y) -> (cast(x AS double) - y) * (cast(x AS double) - y)), "
    "cast(0.0 AS double), (acc, v) -> acc + v), 6)")

# argmin over the broadcast centroid array: per-centroid squared
# distance, rounded to 6 dp, struct-sorted (dist, cid) -> first element.
_KM_BEST = (
    f"element_at(array_sort(transform(cents, c -> "
    f"named_struct('dist', {_KM_DIST}, 'cid', c.cid))), 1)")


def _km_dist_sql(cent_col: str) -> str:
    """DuckDB squared-distance twin: same left-to-right fold order as
    Spark's aggregate(zip_with(...)) via sum(... ORDER BY i)."""
    t = (f"(cast(e.embedding[i] AS double) - {cent_col}[i])"
         f" * (cast(e.embedding[i] AS double) - {cent_col}[i])")
    return (f"round((SELECT sum({t} ORDER BY i)"
            f" FROM generate_series(1, {_DIM}) t(i)), 6)")


@query(
    "emb_kmeans",
    oracle=f"""
    WITH c0 AS (
      SELECT vec_id AS cluster,
             list_transform(embedding, x -> cast(x AS double)) AS cent
      FROM embeddings WHERE vec_id < {_KM_K}
    ),
    d1 AS (
      SELECT e.vec_id, c.cluster, {_km_dist_sql('c.cent')} AS dist
      FROM embeddings e CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM d1) t WHERE rn = 1
    ),
    m1 AS (
      SELECT a1.cluster, i AS pos,
             cast(sum(cast(e.embedding[i] AS decimal(30,8))) AS double)
               / count(*) AS cv
      FROM a1 JOIN embeddings e USING (vec_id)
      CROSS JOIN generate_series(1, {_DIM}) t(i)
      GROUP BY a1.cluster, i
    ),
    c1 AS (
      SELECT cluster, array_agg(cv ORDER BY pos) AS cent
      FROM m1 GROUP BY cluster
    ),
    d2 AS (
      SELECT e.vec_id, c.cluster, {_km_dist_sql('c.cent')} AS dist
      FROM embeddings e CROSS JOIN c1 c
    )
    SELECT vec_id, cluster, dist FROM (
      SELECT vec_id, cluster, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM d2) t WHERE rn = 1
    """,
    tags=("llm", "similarity", "clustering"),
)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding corpus (the
    clustering step under semantic dedup, data-mix bucketing, and IVF
    coarse-quantizer training). k=4 seeds = the k lowest vec_ids;
    two unrolled assign->re-center iterations; output is the final
    (vec_id, cluster, dist) assignment.

    Scale shape (the reason this is written the way it is): the
    ASSIGNMENT pass is shuffle-free — all k centroids pack into ONE
    broadcast row of array<struct<cid,vec>> and the argmin is pure
    column arithmetic (transform + array_sort on (dist, cid) structs),
    so each iteration streams the corpus map-only. The only shuffle
    per iteration is the re-center aggregate, whose cardinality is
    k x dim x partitions partial rows -> k x dim — independent of
    corpus size. At 100 TB that is a few-KB shuffle per iteration;
    the classic MLlib-style per-row (cluster, vec) shuffle never
    happens.

    Cross-engine determinism: distances fold left-to-right in double
    and round to 6 dp before the argmin (tie -> lowest cluster id);
    re-centered means are exact decimal sums / count. An emptied
    cluster drops out of the centroid set identically on both sides.
    """
    (emb,) = tables(spark, sf_dir, "embeddings")
    c0 = (emb.where(F.col("vec_id") < _KM_K)
          .agg(F.expr(
              "array_sort(collect_list(named_struct("
              "'cid', vec_id, "
              "'vec', transform(embedding, x -> cast(x AS double)))))")
          .alias("cents")))
    a1 = (emb.crossJoin(F.broadcast(c0))
          .withColumn("best", F.expr(_KM_BEST))
          .select("vec_id", "embedding", F.col("best.cid").alias("cluster")))
    # re-center: posexplode -> (cluster, pos) partial agg (map-side
    # combine) -> exact-decimal mean -> repack to one broadcast row
    m1 = (a1.select("cluster", F.posexplode("embedding").alias("pos", "v"))
          .groupBy("cluster", "pos")
          .agg((F.sum(F.col("v").cast("decimal(30,8)")).cast("double")
                / F.count("*")).alias("cv")))
    c1 = (m1.groupBy("cluster")
          .agg(F.expr("transform(array_sort(collect_list(struct(pos, cv))),"
                      " s -> s.cv)").alias("vec"))
          .agg(F.expr("array_sort(collect_list(named_struct("
                      "'cid', cluster, 'vec', vec)))").alias("cents")))
    return (emb.crossJoin(F.broadcast(c1))
            .withColumn("best", F.expr(_KM_BEST))
            .select("vec_id",
                    F.col("best.cid").alias("cluster"),
                    F.col("best.dist").alias("dist")))


# --- full kNN graph (LSH-bucketed) -----------------------------------
_KNN_BANDS = 32
_KNN_ROWS = 6     # 6 sign bits/band: prunes to ~1/3 of all pairs on a
_KNN_K = 3        # near-random corpus; far more on clustered real data


def _knn_sig_sql(one_based_col: str, band: int) -> str:
    return _sign_sig_sql(one_based_col, band, _KNN_ROWS, 2)


# Per-(band, sig) membership cap. Without it, candidate-pair count is
# sum-over-buckets |b|^2 — quadratic in N whenever the data doesn't
# spread (measured: a 10x duplicate-heavy corpus made the kNN graph
# 52x slower). Capping each bucket to its _KNN_CAP lowest vec_ids
# bounds pair work at N x bands x cap — LINEAR in corpus size — at
# the cost of candidates lost from oversized buckets (members beyond
# the cap usually still meet in another band; production LSH dedup
# systems use exactly this guard). Deterministic (min-id membership),
# so the DuckDB oracle twins it. The cap does not bind on the gate
# corpora (largest sf0.1 bucket: 56 members).
_KNN_CAP = 64

_KNN_SIG_CAP_SQL = """SELECT vec_id, band, sig FROM (
      SELECT vec_id, band, sig,
             row_number() OVER (PARTITION BY band, sig
                                ORDER BY vec_id) AS rn
      FROM sig0) capped WHERE rn <= {cap}"""


def _capped_buckets(e: DataFrame) -> DataFrame:
    """(vec_id, band, sig) table, each bucket capped to the
    _KNN_CAP lowest vec_ids. The cap window partitions on the same
    (band, sig) key the candidate self-join shuffles on, so it adds
    no extra exchange."""
    buckets = _sig_explode(e)
    wb = Window.partitionBy("band", "sig").orderBy("vec_id")
    return (buckets.withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") <= _KNN_CAP).drop("rn"))


def _sig_explode(e: DataFrame) -> DataFrame:
    """One narrow (vec_id, band, sig) row per vector per band."""
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'sig', "
        + _knn_sig_sql("element_at(embedding, %d)", b) + ")"
        for b in range(_KNN_BANDS))
    return (e.select(
        "vec_id",
        F.explode(F.expr(f"array({band_structs})")).alias("bk"))
        .select("vec_id", F.col("bk.band").alias("band"),
                F.col("bk.sig").alias("sig")))


def _capped_pairs(e: DataFrame, a_col: str, b_col: str,
                  ordered: bool = False) -> DataFrame:
    """Distinct candidate pairs from the capped sign-band buckets,
    WITHOUT a bucket self-join: the windowed cap keeps each bucket's
    _KNN_CAP lowest vec_ids (sort-based, disk-spilling — safe even on
    a degenerate mega-bucket of identical vectors), then ONE
    collect_list per bucket — bounded at <= cap ids by construction,
    so the aggregation buffer cannot blow — and an in-task double
    explode emits the pairs. The groupBy reuses the window's
    (band, sig) hash partitioning, so the whole generator costs ONE
    exchange plus the pair distinct; the embeddings themselves never
    shuffle. (A capless ``slice(sort_array(collect_list(...)))`` would
    be one operator shorter but buffers the entire bucket in memory
    before slicing — the exact unbounded-state hazard the cap exists
    to prevent.) Membership is identical to the row_number cap, so the
    DuckDB algorithm-twin oracles are unchanged.

    ``ordered=True`` emits only pairs with b < a (the semdedup
    "lower-id candidate" shape); otherwise both directions, a != b.

    Dedup piggybacks on the rescore partitioning (round-5 recovery of
    the grouped-pair rewrite's local cost): a pair repeats only when
    two ids co-bucket in MULTIPLE bands, and partitioning on a_col
    alone already colocates every copy of (a, b) — so one explicit
    ``repartition(n, a_col)`` satisfies BOTH the dropDuplicates
    clustering requirement (subset of the dedup keys) and
    _exact_pair_scores' byte-blind-AQE guard, collapsing the old
    distinct-on-(a,b) exchange + rescore repartition into a single
    shuffle of the pair table. Callers pass the result to
    _exact_pair_scores with ``pre_partitioned=True``.
    """
    spark = e.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    grp = (_capped_buckets(e)
           .groupBy("band", "sig")
           .agg(F.sort_array(F.collect_list("vec_id")).alias("members")))
    base = (grp.where(F.size("members") >= 2)
            .select(F.explode("members").alias(a_col), "members")
            .select(a_col, F.explode("members").alias(b_col)))
    cond = (F.col(b_col) < F.col(a_col)) if ordered \
        else (F.col(b_col) != F.col(a_col))
    return (base.where(cond)
            .repartition(nparts, F.col(a_col))
            .dropDuplicates([a_col, b_col]))


def _mirror_scores(scored: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Emit both directions of an ordered scored-pair table in-task.

    The corpus self-pair queries (knn graph, outlier scores, label
    purity) need every candidate pair in BOTH directions, but the
    cosine score is bit-identical either way: IEEE multiplication is
    commutative, the zip_with fold walks the same index order, and
    sqrt(q_n2 * n_n2) commutes — so score(a, b) == score(b, a) to the
    bit. r13 therefore generates only the b < a half (_capped_pairs
    ordered=True), runs the expensive 64-dim rescore fold ONCE per
    unordered pair, and mirrors the narrow (a, b, score) rows with an
    in-task explode — half the interpreted fold work and half the
    rescore-join volume, identical output. The explode (not a union of
    two projections) is load-bearing: a union would duplicate the whole
    rescore subtree and recompute every fold, since no exchange sits
    between the score projection and the union."""
    return (scored
            .select(F.explode(F.array(
                F.struct(F.col(a_col).alias("a"),
                         F.col(b_col).alias("b"), F.col("score")),
                F.struct(F.col(b_col).alias("a"),
                         F.col(a_col).alias("b"), F.col("score"))))
                .alias("p"))
            .select(F.col("p.a").alias(a_col),
                    F.col("p.b").alias(b_col),
                    F.col("p.score").alias("score")))


def _knn_oracle() -> str:
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_knn_sig_sql('embedding[%d]', b)} AS sig "
        f"FROM embeddings"
        for b in range(_KNN_BANDS))
    dot = ("(SELECT sum(cast({a}[i] as double) * cast({b}[i] as double) "
           f"ORDER BY i) FROM generate_series(1, {_DIM}) t(i))")
    return f"""
    WITH sig0 AS ({sig_rows}),
    sig AS ({_KNN_SIG_CAP_SQL.format(cap=_KNN_CAP)}),
    cand AS (
      SELECT DISTINCT q.vec_id, n.vec_id AS neighbor_id
      FROM sig q JOIN sig n ON q.band = n.band AND q.sig = n.sig
      WHERE q.vec_id <> n.vec_id),
    s AS (
      SELECT c.vec_id, c.neighbor_id,
             round({dot.format(a='q.embedding', b='n.embedding')}
                   / sqrt({dot.format(a='q.embedding', b='q.embedding')}
                          * {dot.format(a='n.embedding', b='n.embedding')}),
                   6) AS score
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.vec_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id)
    SELECT vec_id, neighbor_id, rank, score FROM (
      SELECT vec_id, neighbor_id, score,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s) t
    WHERE rank <= {_KNN_K}
    """


@query(
    "knn_graph_lsh",
    oracle=_knn_oracle(),
    tags=("llm", "similarity", "lsh", "graph"),
)
def knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole corpus (the
    primitive under SemDeDup-style semantic dedup, graph clustering,
    and duplicate-cluster discovery): every vector's top-3
    cosine neighbors, found via sign-band LSH candidates + exact
    rescore of candidates only.

    Unlike ann_topk_*, there is no small query set to broadcast — the
    corpus pairs with ITSELF. The plan keeps that survivable at
    100 TB: signatures are a narrow JVM projection (explode of 32
    6-bit band keys); ONE shuffle to the (band, sig) bucket key caps
    each bucket (spill-safe window) and aggregates its member list,
    and the pairs are emitted by an in-task double explode
    (_capped_pairs — no bucket self-join, embeddings never shuffle);
    only surviving candidate pairs pay the 64-dim rescore join. The
    per-bucket membership cap (_KNN_CAP) bounds
    pair work at N x bands x cap — linear in corpus size even on a
    duplicate-heavy corpus (uncapped, a 10x replica corpus measured
    52x slower; see SCALE.md). On clustered real-embedding corpora
    the 6-bit bands prune far harder than on this near-random
    testdata (~1/3 of pairs, recall ~0.7 vs true top-3 — asserted in
    test_llm_ops.py). The DuckDB oracle replicates the ALGORITHM
    (same bands, candidates, fold order, ranking), so the driver
    hash-checks the full output; the approximation is tested, not
    gated."""
    (e,) = tables(spark, sf_dir, "embeddings")
    # ordered half + post-fold mirror: the fold runs once per
    # unordered pair (see _mirror_scores for the bit-exactness proof)
    cand = _capped_pairs(e, "vec_id", "neighbor_id", ordered=True)
    scored = _mirror_scores(
        _exact_pair_scores(spark, cand, e, "vec_id", "neighbor_id",
                           pre_partitioned=True),
        "vec_id", "neighbor_id")
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"),
                                             F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _KNN_K)
            .select("vec_id", "neighbor_id", "rank", "score"))


# --- SemDeDup-style semantic pruning ---------------------------------
_SEM_T = 0.45   # cosine threshold; testdata has real pairs >= 0.45


def _sem_oracle() -> str:
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_knn_sig_sql('embedding[%d]', b)} AS sig "
        f"FROM embeddings"
        for b in range(_KNN_BANDS))
    return f"""
    WITH sig0 AS ({sig_rows}),
    sig AS ({_KNN_SIG_CAP_SQL.format(cap=_KNN_CAP)}),
    cand AS (
      SELECT DISTINCT q.vec_id, n.vec_id AS lower_id
      FROM sig q JOIN sig n ON q.band = n.band AND q.sig = n.sig
      WHERE n.vec_id < q.vec_id),
    pruned AS (
      SELECT DISTINCT c.vec_id
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.vec_id
      JOIN embeddings n ON n.vec_id = c.lower_id
      WHERE round(
        (SELECT sum(cast(q.embedding[i] as double) * cast(n.embedding[i] as double)
                    ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
        / sqrt(
          (SELECT sum(cast(q.embedding[i] as double) * cast(q.embedding[i] as double)
                      ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
          * (SELECT sum(cast(n.embedding[i] as double) * cast(n.embedding[i] as double)
                        ORDER BY i) FROM generate_series(1, {_DIM}) t(i))),
        6) >= {_SEM_T})
    SELECT e.vec_id, p.vec_id IS NULL AS keep
    FROM embeddings e LEFT JOIN pruned p ON p.vec_id = e.vec_id
    """


@query(
    "semdedup_prune",
    oracle=_sem_oracle(),
    tags=("llm", "similarity", "dedup", "lsh"),
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public): a
    vector is dropped when a LOWER-id candidate neighbor sits within
    cosine >= 0.45 — one deterministic pass instead of the paper's
    sequential greedy (min-id acts as the cluster representative).
    Output: (vec_id, keep) for the whole corpus — the decision column
    a curation pipeline joins back onto documents.

    Same scale shape as knn_graph_lsh: candidates from the 6-bit sign
    bands (only (vec_id, band, sig) shuffles), exact rescore on
    candidate pairs only, then one anti-join-shaped LEFT JOIN against
    the distinct pruned set. The DuckDB oracle is the algorithm twin
    (same bands, same fold order, same rounding), so the driver
    hash-checks the full keep/drop vector."""
    (e,) = tables(spark, sf_dir, "embeddings")
    cand = _capped_pairs(e, "vec_id", "lower_id", ordered=True)
    pruned = (_exact_pair_scores(spark, cand, e, "vec_id", "lower_id",
                                 pre_partitioned=True)
              .where(F.col("score") >= _SEM_T)
              .select("vec_id").distinct()
              .withColumn("hit", F.lit(True)))
    return (e.select("vec_id").join(pruned, "vec_id", "left")
            .select("vec_id",
                    F.coalesce(~F.col("hit"), F.lit(True)).alias("keep")))


# --- kNN-based outlier scoring ---------------------------------------
_OUT_T = 0.30   # mean-top3-cosine below this => isolated vector


def _outlier_oracle() -> str:
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_knn_sig_sql('embedding[%d]', b)} AS sig "
        f"FROM embeddings"
        for b in range(_KNN_BANDS))
    dot = ("(SELECT sum(cast({a}[i] as double) * cast({b}[i] as double) "
           f"ORDER BY i) FROM generate_series(1, {_DIM}) t(i))")
    return f"""
    WITH sig0 AS ({sig_rows}),
    sig AS ({_KNN_SIG_CAP_SQL.format(cap=_KNN_CAP)}),
    cand AS (
      SELECT DISTINCT q.vec_id, n.vec_id AS neighbor_id
      FROM sig q JOIN sig n ON q.band = n.band AND q.sig = n.sig
      WHERE q.vec_id <> n.vec_id),
    s AS (
      SELECT c.vec_id, c.neighbor_id,
             round({dot.format(a='q.embedding', b='n.embedding')}
                   / sqrt({dot.format(a='q.embedding', b='q.embedding')}
                          * {dot.format(a='n.embedding', b='n.embedding')}),
                   6) AS score
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.vec_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id),
    top AS (
      SELECT vec_id, score FROM (
        SELECT vec_id, score,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, neighbor_id) AS rank
        FROM s) t WHERE rank <= {_KNN_K}),
    agg AS (
      SELECT vec_id, count(*) AS n_neighbors,
             cast(sum(cast(round(score * 1000000) AS bigint)) AS bigint)
               / (count(*) * 1000000e0) AS mean_top
      FROM top GROUP BY vec_id)
    SELECT e.vec_id,
           coalesce(a.n_neighbors, 0) AS n_neighbors,
           round(coalesce(a.mean_top, 0.0), 6) AS mean_top_score,
           (a.vec_id IS NULL OR a.n_neighbors < {_KNN_K}
            OR round(a.mean_top, 6) < {_OUT_T}) AS is_outlier
    FROM embeddings e LEFT JOIN agg a ON a.vec_id = e.vec_id
    """


@query(
    "emb_outlier_scores",
    oracle=_outlier_oracle(),
    tags=("llm", "similarity", "graph", "curation"),
)
def emb_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus outlier scoring (the cleaning step that drops
    junk/garbled vectors before clustering or semantic dedup): each
    vector's mean cosine over its top-3 candidate neighbors; a vector
    is an outlier when it has fewer than 3 candidates or a mean below
    0.30 — i.e., nothing in the corpus is like it.

    Built on the capped kNN-graph machinery (same bands, cap, and
    rescore — see knn_graph_lsh for the 100 TB shape). Mean is an
    integer-exact sum of 1e6-scaled rounded scores so both engines
    divide identical longs — summation order cannot drift the gate.
    """
    (e,) = tables(spark, sf_dir, "embeddings")
    # ordered half + post-fold mirror (see _mirror_scores): one fold
    # per unordered pair instead of two
    cand = _capped_pairs(e, "vec_id", "neighbor_id", ordered=True)
    scored = _mirror_scores(
        _exact_pair_scores(spark, cand, e, "vec_id", "neighbor_id",
                           pre_partitioned=True),
        "vec_id", "neighbor_id")
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"),
                                             F.asc("neighbor_id"))
    top = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= _KNN_K))
    agg = (top.groupBy("vec_id")
           .agg(F.count("*").alias("n_neighbors"),
                (F.sum(F.expr("cast(round(score * 1000000) AS bigint)"))
                 / (F.count("*") * F.lit(1000000.0))).alias("mean_top")))
    return (e.select("vec_id").join(agg, "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
                F.round(F.coalesce(F.col("mean_top"), F.lit(0.0)), 6)
                .alias("mean_top_score"),
                (F.col("n_neighbors").isNull()
                 | (F.col("n_neighbors") < _KNN_K)
                 | (F.round(F.col("mean_top"), 6) < _OUT_T))
                .alias("is_outlier")))


# --- corpus similarity profile (fixed-budget probe) ------------------
_HIST_K = 300   # probe-subset size; work is K^2/2 pairs at ANY corpus size


@query(
    "emb_similarity_histogram",
    oracle=f"""
    WITH probe AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT {_HIST_K}),
    s AS (
      SELECT round(
               (SELECT sum(cast(a.embedding[i] as double) * cast(b.embedding[i] as double)
                           ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
               / sqrt(
                 (SELECT sum(cast(a.embedding[i] as double) * cast(a.embedding[i] as double)
                             ORDER BY i) FROM generate_series(1, {_DIM}) t(i))
                 * (SELECT sum(cast(b.embedding[i] as double) * cast(b.embedding[i] as double)
                               ORDER BY i) FROM generate_series(1, {_DIM}) t(i))),
               6) AS score
      FROM probe a JOIN probe b ON a.vec_id < b.vec_id)
    SELECT cast(floor(score * 10) as bigint) AS bin,
           count(*) AS n_pairs,
           cast(sum(cast(round(score * 1000000) as bigint)) as bigint) AS score_sum_1e6
    FROM s GROUP BY bin
    """,
    tags=("llm", "similarity", "stats"),
)
def emb_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus similarity profile: the distribution of pairwise cosines
    over a fixed probe subset — the observability dial that picks
    dedup/semdedup thresholds (where does the near-dup mass start?)
    and validates LSH banding choices against the actual corpus.

    Scale design: the probe is the K={_HIST_K} lowest vec_ids, so the
    pair enumeration is K^2/2 regardless of corpus size — constant
    work at 100 TB (the subset read prunes via TakeOrdered, never a
    full-corpus shuffle). Bin counts and the 1e6-scaled integer score
    sums are exact and summation-order-free, so the histogram is
    bit-stable across engines and partitionings.
    """
    (e,) = tables(spark, sf_dir, "embeddings")
    probe = (e.select("vec_id", "embedding")
             .orderBy("vec_id").limit(_HIST_K))
    a = probe.select(F.col("vec_id").alias("id_a"),
                     F.col("embedding").alias("q_emb"),
                     F.expr(_SELF_N2).alias("q_n2"))
    b = probe.select(F.col("vec_id").alias("id_b"),
                     F.col("embedding").alias("n_emb"),
                     F.expr(_SELF_N2).alias("n_n2"))
    pairs = (a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
             .withColumn("score", F.round(
                 F.expr(_DOT) / F.sqrt(F.col("q_n2") * F.col("n_n2")), 6)))
    return (pairs
            .groupBy(F.expr("cast(floor(score * 10) as bigint)").alias("bin"))
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.expr("cast(round(score * 1000000) as bigint)"))
                 .alias("score_sum_1e6")))


# --- embedding-quality eval: kNN label purity ------------------------

def _purity_oracle() -> str:
    return f"""
    SELECT cast(l.label as bigint) AS label,
           count(*) AS pairs,
           cast(sum(CASE WHEN l.label = n.label THEN 1 ELSE 0 END)
                as bigint) AS same_label,
           round(cast(sum(CASE WHEN l.label = n.label THEN 1 ELSE 0 END)
                      as double) / count(*), 6) AS purity
    FROM ({_knn_oracle()}) k
    JOIN embeddings l ON l.vec_id = k.vec_id
    JOIN embeddings n ON n.vec_id = k.neighbor_id
    GROUP BY 1
    ORDER BY 1
    """


@query(
    "emb_label_knn_purity",
    oracle=_purity_oracle(),
    tags=("llm", "similarity", "lsh", "eval"),
)
def emb_label_knn_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: per-label kNN label purity — for each
    vector's top-3 approximate neighbors (the knn_graph_lsh machinery:
    capped sign-band candidates + exact rescore), what fraction share
    the vector's label. The standard eval a training pipeline runs
    before trusting an embedding column for semantic dedup or
    curation: purity near the label prior means the embeddings carry
    no signal; purity near 1 means neighbor-based ops are meaningful.

    Scale shape: identical to knn_graph_lsh (one bucket-key exchange,
    in-task pair generation, rescore on candidates only) plus two
    label joins on vec_id — the label table is a narrow projection of
    the same corpus, shuffled once on its id. Output is one row per
    label: exact integer pair counts plus purity as a single division
    rounded at 1e-6, so the driver hash-gates it."""
    (e,) = tables(spark, sf_dir, "embeddings")
    # ordered half + post-fold mirror (see _mirror_scores): one fold
    # per unordered pair instead of two
    cand = _capped_pairs(e, "vec_id", "neighbor_id", ordered=True)
    scored = _mirror_scores(
        _exact_pair_scores(spark, cand, e, "vec_id", "neighbor_id",
                           pre_partitioned=True),
        "vec_id", "neighbor_id")
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"),
                                             F.asc("neighbor_id"))
    top = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= _KNN_K)
           .select("vec_id", "neighbor_id"))
    lab = e.select("vec_id", F.col("label").cast("long").alias("label"))
    nlab = e.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("n_label"))
    j = top.join(lab, "vec_id").join(nlab, "neighbor_id")
    same = F.when(F.col("label") == F.col("n_label"), 1).otherwise(0)
    return (j.groupBy("label")
            .agg(F.count("*").alias("pairs"),
                 F.sum(same).cast("long").alias("same_label"))
            .select("label", "pairs", "same_label",
                    F.round(F.col("same_label")
                            / F.col("pairs"), 6).alias("purity"))
            .orderBy("label"))


# --- product quantization (PQ codes) ----------------------------------
_PQ_M = 4                      # subspaces
_PQ_SUB = _DIM // _PQ_M        # dims per subspace (16)
_PQ_K = 4                      # centroids per subspace codebook

# squared distance between a vec's subspace slice and a codebook
# centroid (both already double arrays), folded left-to-right and
# rounded to 6 dp before the argmin — the emb_kmeans determinism
# contract, applied per subspace
_PQ_DIST = (
    "round(aggregate(zip_with(sub, c.vec, "
    "(x, y) -> (x - y) * (x - y)), "
    "cast(0.0 AS double), (acc, v) -> acc + v), 6)")
_PQ_BEST = (
    f"element_at(array_sort(transform(cb.cents, c -> "
    f"named_struct('dist', {_PQ_DIST}, 'cid', c.cid))), 1)")


def _pq_dist_sql(cent_col: str) -> str:
    t = (f"(cast(e.embedding[(t.s * {_PQ_SUB}) + i] AS double)"
         f" - {cent_col}[i])"
         f" * (cast(e.embedding[(t.s * {_PQ_SUB}) + i] AS double)"
         f" - {cent_col}[i])")
    return (f"round((SELECT sum({t} ORDER BY i)"
            f" FROM generate_series(1, {_PQ_SUB}) g(i)), 6)")


@query(
    "emb_pq_codes",
    oracle=f"""
    WITH subs AS (
      SELECT e.vec_id, t.s,
             list_transform(e.embedding[(t.s * {_PQ_SUB}) + 1 :
                                        (t.s + 1) * {_PQ_SUB}],
                            x -> cast(x AS double)) AS sub
      FROM embeddings e
      CROSS JOIN generate_series(0, {_PQ_M - 1}) t(s)),
    c0 AS (
      SELECT s, vec_id AS cid, sub AS cent FROM subs
      WHERE vec_id < {_PQ_K}),
    d1 AS (
      SELECT e.vec_id, t.s, c.cid, {_pq_dist_sql('c.cent')} AS dist
      FROM embeddings e
      CROSS JOIN generate_series(0, {_PQ_M - 1}) t(s)
      JOIN c0 c ON c.s = t.s),
    a1 AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM d1) t WHERE rn = 1),
    m1 AS (
      SELECT a1.s, a1.cid, g.i AS pos,
             cast(sum(cast(e.embedding[(a1.s * {_PQ_SUB}) + g.i]
                           AS decimal(30,8))) AS double)
               / count(*) AS cv
      FROM a1 JOIN embeddings e USING (vec_id)
      CROSS JOIN generate_series(1, {_PQ_SUB}) g(i)
      GROUP BY a1.s, a1.cid, g.i),
    c1 AS (
      SELECT s, cid, array_agg(cv ORDER BY pos) AS cent
      FROM m1 GROUP BY s, cid),
    d2 AS (
      SELECT e.vec_id, t.s, c.cid, {_pq_dist_sql('c.cent')} AS dist
      FROM embeddings e
      CROSS JOIN generate_series(0, {_PQ_M - 1}) t(s)
      JOIN c1 c ON c.s = t.s),
    a2 AS (
      SELECT vec_id, s, cid, dist FROM (
        SELECT vec_id, s, cid, dist,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM d2) t WHERE rn = 1)
    SELECT vec_id,
           string_agg(cast(cid AS varchar), '|' ORDER BY s) AS pq_codes,
           cast(sum(cast(round(dist * 1000000) AS bigint)) as bigint)
             AS err_u
    FROM a2 GROUP BY vec_id
    """,
    tags=("llm", "similarity", "vector", "quantize"),
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., PAMI 2011) — the codebook
    compression behind IVF-PQ serving indexes: split each vector into
    {m} subspaces, train a tiny per-subspace codebook (deterministic
    Lloyd: seeds = lowest vec_ids, one re-center pass — the
    emb_kmeans recipe applied per subspace), and store each vector as
    m small codes. 64 dims collapse to 4 bytes; ANN scoring becomes
    table lookups (ADC) downstream.

    Scale shape, inherited from emb_kmeans: ALL m codebooks pack into
    ONE broadcast row (array of (s, cid, centroid) structs); both
    assignment passes are shuffle-free map work (slice + zip_with
    fold + struct argmin per subspace); the only shuffle is the
    re-center aggregate at (m x k x sub_dim) cardinality — independent
    of corpus size. Cross-engine determinism: 6-dp-rounded
    left-to-right double folds, decimal-exact means, ties to the
    lowest code id; the per-vec error reports in integer micro-units.
    """
    (emb,) = tables(spark, sf_dir, "embeddings")
    sub_expr = (f"transform(slice(embedding, (s * {_PQ_SUB}) + 1, "
                f"{_PQ_SUB}), x -> cast(x AS double))")

    def codebook_row(src):
        """(s, cid, cent-array) rows -> ONE broadcast row of structs."""
        return src.agg(F.expr(
            "array_sort(collect_list(named_struct("
            "'s', s, 'cid', cid, 'vec', cent)))").alias("all_cents"))

    def subs_of(df):
        """Explode the subspace index and slice per (vec, s)."""
        return (df.select("vec_id", "embedding",
                          F.explode(F.expr(
                              f"sequence(0, {_PQ_M - 1})")).alias("s"))
                .withColumn("sub", F.expr(sub_expr)))

    c0 = codebook_row(
        subs_of(emb.where(F.col("vec_id") < _PQ_K))
        .select("s", F.col("vec_id").alias("cid"),
                F.col("sub").alias("cent")))

    def assign(cb_row):
        """Per (vec, s): argmin code against this codebook row."""
        best = (f"element_at(array_sort(transform("
                f"filter(all_cents, c -> c.s = s), c -> "
                f"named_struct('dist', {_PQ_DIST}, "
                f"'cid', c.cid))), 1)")
        return (subs_of(emb).crossJoin(F.broadcast(cb_row))
                .withColumn("best", F.expr(best))
                .select("vec_id", "s", "sub",
                        F.col("best.cid").alias("cid"),
                        F.col("best.dist").alias("dist")))

    a1 = assign(c0)
    # `sub` rides along from assign() — re-center reads it directly
    # instead of shuffle-joining the corpus back onto itself (r11:
    # the join was a full-corpus exchange; Catalyst prunes the column
    # from a2's branch where the final agg never touches it)
    m1 = (a1.select("s", "cid", F.posexplode("sub").alias("pos", "v"))
          .groupBy("s", "cid", "pos")
          .agg((F.sum(F.col("v").cast("decimal(30,8)")).cast("double")
                / F.count("*")).alias("cv")))
    c1 = codebook_row(
        m1.groupBy("s", "cid")
        .agg(F.expr("transform(array_sort(collect_list(struct(pos, cv))),"
                    " p -> p.cv)").alias("cent")))
    a2 = assign(c1)
    return (a2.groupBy("vec_id").agg(
        F.expr("array_join(transform(array_sort(collect_list("
               "struct(s, cid))), p -> cast(p.cid AS string)), '|')")
        .alias("pq_codes"),
        F.expr("sum(cast(round(dist * 1000000) AS bigint))").cast("long")
        .alias("err_u")))
