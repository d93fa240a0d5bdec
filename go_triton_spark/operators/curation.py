"""Corpus-curation operators: quota sampling, benchmark
decontamination, PII scrubbing — the selection/cleaning stages of a
training-data pipeline (north-star extensions; the reference has no
analog, SURVEY section 2.2).

Scale notes:
- quota sampling is the window top-k shape: one shuffle on the quota
  key, per-partition heaps, never a global sort
- decontamination is a broadcast semi/anti join against the (small)
  benchmark shingle set — the corpus never shuffles
- PII scrubbing is a narrow projection (regexp, JVM-side)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import contract, query, tables
from go_triton_spark.operators.dedup import (_ORACLE_PAIR_CTES,
                                             _ORACLE_SHINGLES, _SHINGLES,
                                             _shingle_df)


@query(
    "curate_quota_sample",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) t
    WHERE rn <= 5
    ORDER BY lang, n_chars DESC, doc_id
    """,
    tags=("llm", "curation", "topk"),
)
def curate_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling: keep the top 5 documents per lang
    by length (stand-in for any quality score). Window top-k — one
    shuffle on the quota key, per-partition heap."""
    (d,) = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5)
            .select("lang", "doc_id", "n_chars")
            .orderBy("lang", F.desc("n_chars"), "doc_id"))


@query(
    "curate_decontaminate",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_ORACLE_SHINGLES} AS s FROM documents),
    bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id < 5),
    flagged AS (
      SELECT DISTINCT sh.doc_id
      FROM sh, unnest(sh.s) AS u(shingle)
      WHERE sh.doc_id >= 5 AND u.shingle IN (SELECT shingle FROM bench))
    SELECT d.doc_id,
           d.doc_id IN (SELECT doc_id FROM flagged) AS contaminated
    FROM documents d WHERE d.doc_id >= 5
    """,
    tags=("llm", "curation", "dedup"),
)
def curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word-3-gram with the benchmark set (doc_id < 5 stands in for an
    eval suite).

    Plan: the benchmark shingle set is tiny -> ONE broadcast row of
    collect_set'd shingles; the corpus probes it with arrays_overlap
    in a single JVM map (no corpus-side explode, no shuffle), then a
    left join back onto ids restores too-short-to-shingle docs as
    clean. The corpus text itself never shuffles.
    """
    (d,) = tables(spark, sf_dir, "documents")
    # Benchmark side: 5 docs straight off the parquet scan (pushed
    # doc_id filter), shingled inline and collapsed to ONE row holding
    # the distinct shingle set — no pass over the corpus-sized cache.
    bench_set = (d.where(F.col("doc_id") < 5)
                 .select("doc_id", F.split("text", " ").alias("ws"))
                 .select(F.explode(F.expr(_SHINGLES)).alias("shingle"))
                 .agg(F.collect_set("shingle").alias("bench_shingles")))
    # Corpus side: the shared cached shingle DF (same cache entry the
    # dedup family uses), CONTRACTED to this query's own per-row cost —
    # the cache is partitioned for ~1 ms/row Jaccard work, but this
    # probe is an Arrow-speed map (r8 regression: inheriting the 32-way
    # fanout cost 1.6x in task overhead alone).
    sh = contract(_shingle_df(spark, sf_dir).where(F.col("doc_id") >= 5),
                  spark, d, rows_per_task=2_000)
    # SIZE CONTRACT for the broadcast: `bench_set` is the
    # decontamination reference (eval-suite shingles), bounded by the
    # benchmark corpus — thousands of docs -> at most a few million
    # distinct shingles, tens of MB in one row. It does NOT grow with
    # the training corpus being scrubbed. The corpus never explodes:
    # arrays_overlap probes each doc's shingle array against the
    # broadcast row in a single JVM map — no shuffle anywhere on the
    # corpus side. If a deployment ever decontaminates against a
    # corpus-sized blocklist, switch back to an exploded shuffle
    # semi-join on shingle.
    flagged = (sh.join(F.broadcast(bench_set))
               .select("doc_id",
                       F.arrays_overlap("shingles", "bench_shingles")
                        .alias("contaminated"))
               .where(F.col("contaminated")))
    return (d.where(F.col("doc_id") >= 5)
            .join(flagged, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("contaminated", F.lit(False)).alias("contaminated")))


@query(
    "curate_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{6,}', '<NUM>', 'g'))                AS scrubbed_md5,
           len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
             + len(regexp_extract_all(text, '[0-9]{6,}'))   AS n_redactions
    FROM documents
    """,
    tags=("llm", "curation", "scalar"),
)
def curate_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact email-shaped tokens and long digit runs
    (simple char-class regexes — portable between Java regex and RE2).
    Output is the md5 of the scrubbed text (narrow) + redaction count.
    A narrow projection — embarrassingly parallel at any scale."""
    (d,) = tables(spark, sf_dir, "documents")
    email = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    nums = "[0-9]{6,}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), nums, "<NUM>")
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        (F.expr(f"regexp_count(text, '{email}')")
         + F.expr(f"regexp_count(text, '{nums}')")).cast("long")
         .alias("n_redactions"))


@query(
    "curate_canonical_docs",
    oracle=f"""
    WITH {_ORACLE_PAIR_CTES},
    e AS (SELECT id_a AS a, id_b AS b FROM p WHERE inter * 10 >= uni * 7
          UNION SELECT id_b, id_a FROM p WHERE inter * 10 >= uni * 7),
    r AS (
      WITH RECURSIVE reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a)
      SELECT * FROM reach),
    clusters AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk
      FROM clusters c JOIN documents d USING (doc_id))
    SELECT cluster_id,
           min(doc_id) FILTER (WHERE rk = 1) AS kept_doc_id,
           count(*) AS n_members
    FROM ranked GROUP BY cluster_id
    """,
    tags=("llm", "curation", "dedup"),
)
def curate_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup pipeline: per near-dup cluster, keep one
    canonical document (longest text, doc_id tie-break) and count the
    members it supersedes. Composes the LSH candidate graph ->
    connected components (dedup_clusters) with an argmax-per-group.
    At 100 TB the ranked window runs on the clustered subset only —
    the overwhelming singleton majority never enters the shuffle."""
    from go_triton_spark.operators.relational3 import dedup_clusters
    from pyspark.sql.window import Window

    clusters = dedup_clusters(spark, sf_dir)  # (doc_id, cluster_id)
    (d,) = tables(spark, sf_dir, "documents")
    ranked = clusters.join(d.select("doc_id", "n_chars"), "doc_id").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cluster_id")
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))),
    )
    return ranked.groupBy("cluster_id").agg(
        F.expr("min(doc_id) FILTER (WHERE rk = 1)").alias("kept_doc_id"),
        F.count("*").alias("n_members"),
    )


@query(
    "curate_pipeline_end_to_end",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, text,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      FROM documents
    ), q AS (
      SELECT doc_id, lang, text,
             1.0 - cast(len(list_distinct(ts)) AS double) / len(ts) AS dup_frac
      FROM toks WHERE len(ts) > 0
    ), kept AS (
      SELECT doc_id, lang, text FROM q WHERE dup_frac <= 0.5
    ), uniq AS (
      SELECT min(doc_id) AS doc_id, lang
      FROM kept GROUP BY md5(text), lang
    ), sampled AS (
      SELECT * FROM uniq WHERE ((doc_id % 1000000007) * 2654435761) % 100 < 50
    )
    SELECT lang, count(*) AS n_final, min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM sampled GROUP BY lang
    """,
    tags=("llm", "curation", "pipeline"),
)
def curate_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass: quality gate (duplicate-word
    fraction) -> exact dedup (md5 canonical = min doc_id) -> ~50%
    deterministic hash sample -> per-language accounting. One lazy
    plan: Catalyst fuses the filter chain into the scan, the only
    shuffles are the dedup groupBy and the final small aggregate —
    the shape a 100 TB curation job actually runs, stages chained
    without materialization between them."""
    (d,) = tables(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", "text",
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("ts"))
    q = toks.where(F.expr("size(ts) > 0")).select(
        "doc_id", "lang", "text",
        (F.lit(1.0) - F.expr("cast(size(array_distinct(ts)) AS double)")
         / F.expr("size(ts)")).alias("dup_frac"))
    kept = q.where(F.col("dup_frac") <= 0.5)
    uniq = (kept.groupBy(F.md5("text").alias("h"), F.col("lang"))
            .agg(F.min("doc_id").alias("doc_id")))
    sampled = uniq.where(((F.col("doc_id") % 1000000007) * 2654435761) % 100 < 50)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_final"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def _semantic_dedup_oracle() -> str:
    from go_triton_spark.operators.similarity import _sem_oracle

    return f"""
    WITH decisions AS ({_sem_oracle()}),
    joined AS (
      SELECT d.doc_id, d.lang, coalesce(s.keep, TRUE) AS keep
      FROM documents d LEFT JOIN decisions s ON s.vec_id = d.doc_id)
    SELECT lang, count(*) AS n_docs,
           cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) as bigint) AS n_kept,
           cast(sum(CASE WHEN keep THEN 0 ELSE doc_id END) as bigint)
             AS dropped_id_sum
    FROM joined GROUP BY lang
    """


@query(
    "curate_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    tags=("llm", "curation", "dedup", "semantic"),
)
def curate_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply SemDeDup decisions to the DOCUMENT corpus: a document is
    dropped when its embedding (vec_id == doc_id where one exists) was
    semantically pruned; documents without an embedding pass through.
    Output: per (lang) counts of kept/dropped docs plus id checksums —
    the shape a curation report consumes.

    This is the end-to-end bridge between the text and vector sides
    of the pipeline (embed -> prune vectors -> filter corpus). Scale:
    the decision table is (vec_id, keep) — two longs per vector — so
    the corpus-side join shuffles ids only, never text; the semantic
    pruning itself is the capped-bucket LSH plan (see semdedup_prune).
    """
    from go_triton_spark.operators.similarity import semdedup_prune

    (d,) = tables(spark, sf_dir, "documents")
    dec = semdedup_prune(spark, sf_dir).withColumnRenamed("vec_id", "doc_id")
    joined = (d.select("doc_id", "lang").join(dec, "doc_id", "left")
              .select("doc_id", "lang",
                      F.coalesce(F.col("keep"), F.lit(True)).alias("keep")))
    return (joined.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
                 F.sum(F.when(~F.col("keep"), F.col("doc_id"))
                       .otherwise(0)).alias("dropped_id_sum")))


def _datacard_oracle() -> str:
    from go_triton_spark.operators.similarity import _sem_oracle

    return f"""
    WITH {_ORACLE_PAIR_CTES},
    decisions AS ({_sem_oracle()}),
    groups AS (
      SELECT md5(text) AS fp, count(*) AS copies FROM documents
      GROUP BY md5(text))
    SELECT 'n_docs' AS metric, cast(count(*) AS bigint) AS value FROM documents
    UNION ALL
    SELECT 'n_langs', cast(count(DISTINCT lang) AS bigint) FROM documents
    UNION ALL
    SELECT 'total_chars', cast(sum(n_chars) AS bigint) FROM documents
    UNION ALL
    SELECT 'exact_dup_groups', cast(count(*) AS bigint)
    FROM groups WHERE copies > 1
    UNION ALL
    SELECT 'exact_dup_docs', cast(coalesce(sum(copies), 0) AS bigint)
    FROM groups WHERE copies > 1
    UNION ALL
    SELECT 'near_dup_pairs', cast(count(*) AS bigint)
    FROM p WHERE inter * 10 >= uni * 7
    UNION ALL
    SELECT 'semantic_dropped', cast(sum(CASE WHEN keep THEN 0 ELSE 1 END)
                                    AS bigint)
    FROM decisions
    """


@query(
    "curate_datacard",
    oracle=_datacard_oracle(),
    tags=("llm", "curation", "stats"),
)
def curate_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call corpus data card: the summary a curation run publishes
    — corpus size, language spread, exact-duplication mass, verified
    near-dup pair count (MinHash-LSH candidates + exact Jaccard
    verify), and the SemDeDup semantic drop count. Each metric is the
    head aggregate of an already-gated primitive, composed as a single
    union-all plan; everything reduces before it unions, so the result
    is 7 rows at any corpus size and each branch keeps its own
    documented scale shape."""
    from go_triton_spark.operators.dedup import dedup_minhash_lsh
    from go_triton_spark.operators.similarity import semdedup_prune

    (d,) = tables(spark, sf_dir, "documents")

    def row(metric: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(metric).alias("metric"),
                         F.col("value").cast("long").alias("value"))

    groups = (d.groupBy(F.md5("text").alias("fp"))
              .agg(F.count("*").alias("copies"))
              .where(F.col("copies") > 1))
    parts = [
        row("n_docs", d.agg(F.count("*").alias("value"))),
        row("n_langs", d.agg(F.countDistinct("lang").alias("value"))),
        row("total_chars", d.agg(F.sum("n_chars").alias("value"))),
        row("exact_dup_groups", groups.agg(F.count("*").alias("value"))),
        row("exact_dup_docs",
            groups.agg(F.coalesce(F.sum("copies"), F.lit(0)).alias("value"))),
        row("near_dup_pairs",
            dedup_minhash_lsh(spark, sf_dir).agg(F.count("*").alias("value"))),
        row("semantic_dropped",
            semdedup_prune(spark, sf_dir)
            .agg(F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("value"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "curate_importance_resample",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts)-1),
                                   i -> ts[i] || ' ' || ts[i+1])) AS bg
      FROM toks WHERE len(ts) >= 2),
    contrib AS (
      SELECT doc_id,
             strpos('0123456789abcdef', substr(md5(bg), 1, 1))
             - strpos('0123456789abcdef', substr(md5(bg), 2, 1)) AS w
      FROM big),
    scored AS (
      SELECT t.doc_id,
             cast(coalesce(sum(c.w), 0) as bigint) AS score
      FROM toks t LEFT JOIN contrib c USING (doc_id)
      GROUP BY t.doc_id)
    SELECT doc_id, score, score >= 40 AS selected FROM scored
    """,
    tags=("llm", "curation"),
)
def curate_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed-bigram
    features, a per-bucket target/source log-ratio table, document
    score = sum of its bigrams' ratios, select docs above the
    resampling threshold.

    Engine-parity surrogate for the ratio table: production DSIR
    broadcasts learned log(p_target/p_source) per hash bucket; here
    the lookup is the INTEGER difference of two md5 hex digits of the
    bigram — same computational shape (hash -> bucket weight -> sum),
    exact in both engines, no float logs on the hash path. Selection
    uses a fixed integer threshold; production swaps in an
    approx-quantile cut plus Gumbel noise for sampled (not top-k)
    selection.

    At 100 TB: tokenize/hash/weight is a JVM-side narrow pass (HOFs +
    md5, whole-stage codegen), the only shuffle is the per-doc sum
    (map-side combinable), and the threshold filter is free. No
    Python anywhere.
    """
    (d,) = tables(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("ts"))
    contrib = (
        toks.where(F.expr("size(ts) >= 2"))
        .select("doc_id", F.explode(
            F.expr("transform(sequence(1, size(ts)-1), "
                   "i -> concat(ts[i-1], ' ', ts[i]))")).alias("bg"))
        .select("doc_id",
                (F.expr("instr('0123456789abcdef', substr(md5(bg), 1, 1))")
                 - F.expr("instr('0123456789abcdef', substr(md5(bg), 2, 1))")
                 ).alias("w")))
    scored = (
        toks.select("doc_id").join(
            contrib.groupBy("doc_id").agg(F.sum("w").alias("s")),
            "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("score")))
    return scored.select("doc_id", "score",
                         (F.col("score") >= 40).alias("selected"))


@query(
    "curate_containment",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_ORACLE_SHINGLES} AS s FROM documents),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sz AS (SELECT doc_id, len(s) AS sz FROM sh),
    ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
    SELECT id_a, id_b, cast(inter as bigint) AS inter,
           cast(least(sa.sz, sb.sz) as bigint) AS min_sz
    FROM ip JOIN sz sa ON sa.doc_id = ip.id_a
            JOIN sz sb ON sb.doc_id = ip.id_b
    WHERE inter * 10 >= least(sa.sz, sb.sz) * 8 AND inter > 0
    """,
    tags=("llm", "curation", "dedup"),
)
def curate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT pairs: |A intersect B| / min(|A|, |B|)
    >= 0.8 over word-3-gram sets. Jaccard misses the case curation
    actually hunts — a short document (or benchmark item) QUOTED
    inside a much longer one drives the union up and Jaccard down,
    while containment stays ~1. This is the partial-copy /
    quote-detection primitive next to dedup_ngram_jaccard's symmetric
    near-dup.

    Same inverted-index plan as the Jaccard pass (explode shingles,
    self-join on 64-bit shingle hashes, count shared per pair) with an
    integer-math threshold against the SMALLER set size. The shingle
    cache is shared with the whole dedup family; at 100 TB candidates
    come from the same banded-LSH front end.
    """
    sh = _shingle_df(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    ex = (sh.select("doc_id", F.explode("shingles").alias("shingle"))
          .select("doc_id", F.xxhash64("shingle").alias("g")))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter")))
    return (
        pairs
        .join(sizes.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("min_sz", F.least("sz_a", "sz_b"))
        .where((F.col("inter") * 10 >= F.col("min_sz") * 8)
               & (F.col("inter") > 0))
        .select("id_a", "id_b", F.col("inter").cast("long").alias("inter"),
                F.col("min_sz").cast("long").alias("min_sz")))
