"""Text-analysis operators for LLM training-data pipelines.

All run over the ``documents`` table (doc_id, text, lang, source,
n_chars). Every computation is engine-portable integer/decimal/string
math so the DuckDB oracle checks values exactly:

- token counting (whitespace split + chars + a BPE-ish estimate)
- language ID (marker-token heuristic; the real lang column is ground
  truth to compare against, not an input to the heuristic)
- quality scoring (length/diversity/stopword ratios)
- document fingerprinting (md5 canonical hash + prefix bucket)

Scale: all are narrow per-row transforms (no shuffle except final
aggs) — at 100 TB they pipeline inside one codegen stage per
partition. The only UDF-free exception is nothing: every op here is
built-in JVM expressions on purpose (UDFs are the slow path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, tables

#: marker tokens for the language-ID heuristic (per candidate lang)
_LANG_MARKERS = {
    "en": ("the", "a"),
    "tech": ("spark", "query", "data"),
    "ops": ("stream", "batch", "merge"),
}


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_tokens,
           length(text)                                    AS n_chars_measured,
           n_chars                                         AS n_chars_given,
           cast(ceil(length(text) / 4.0) as bigint)        AS est_bpe_tokens,
           len(list_distinct(string_split(text, ' ')))     AS n_unique_tokens
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts + BPE-ish estimate (chars/4 heuristic
    from public LLM tokenizer rules of thumb)."""
    (d,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_given"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_bpe_tokens"),
        F.size(F.array_distinct(ws)).alias("n_unique_tokens"),
    )


def _marker_hits_spark(col, token):
    return F.size(F.filter(col, lambda w: w == F.lit(token)))


@query(
    "text_language_id",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    h AS (
      SELECT doc_id, lang,
             len(list_filter(ws, w -> w = 'the')) + len(list_filter(ws, w -> w = 'a'))  AS hits_en,
             len(list_filter(ws, w -> w = 'spark')) + len(list_filter(ws, w -> w = 'query'))
               + len(list_filter(ws, w -> w = 'data'))                                  AS hits_tech,
             len(list_filter(ws, w -> w = 'stream')) + len(list_filter(ws, w -> w = 'batch'))
               + len(list_filter(ws, w -> w = 'merge'))                                 AS hits_ops,
             len(ws) AS n_tokens
      FROM t)
    SELECT doc_id, lang AS lang_actual, hits_en, hits_tech, hits_ops,
           CASE WHEN hits_tech >= hits_ops AND hits_tech >= hits_en THEN 'tech'
                WHEN hits_ops  >= hits_en                           THEN 'ops'
                WHEN hits_en   >  0                                 THEN 'en'
                ELSE 'unknown' END AS lang_guess
    FROM h
    """,
    tags=("llm", "text"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language/domain ID (n-gram-heuristic family).
    Deterministic argmax with a fixed priority tie-break."""
    (d,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    h_en =(_marker_hits_spark(ws, "the") + _marker_hits_spark(ws, "a")).alias("hits_en")
    h_tech = (_marker_hits_spark(ws, "spark") + _marker_hits_spark(ws, "query")
              + _marker_hits_spark(ws, "data")).alias("hits_tech")
    h_ops = (_marker_hits_spark(ws, "stream") + _marker_hits_spark(ws, "batch")
             + _marker_hits_spark(ws, "merge")).alias("hits_ops")
    base = d.select("doc_id", F.col("lang").alias("lang_actual"), h_en, h_tech, h_ops)
    return base.withColumn(
        "lang_guess",
        F.when((F.col("hits_tech") >= F.col("hits_ops"))
               & (F.col("hits_tech") >= F.col("hits_en")), "tech")
         .when(F.col("hits_ops") >= F.col("hits_en"), "ops")
         .when(F.col("hits_en") > 0, "en")
         .otherwise("unknown"))


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS nc FROM documents)
    SELECT doc_id,
           len(ws) AS n_tokens,
           cast(len(list_distinct(ws)) as double) / len(ws)       AS distinct_ratio,
           cast(nc - len(ws) + 1 as double) / len(ws)             AS avg_token_len,
           cast(CASE WHEN len(ws) BETWEEN 20 AND 80 THEN 1 ELSE 0 END
                as bigint)                                        AS len_ok,
           cast(round(
             cast(len(list_distinct(ws)) as double) / len(ws) * 0.5
             + CASE WHEN len(ws) BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END
             + CASE WHEN cast(nc - len(ws) + 1 as double) / len(ws) >= 4.0
                    THEN 0.2 ELSE 0.0 END, 6) as double)          AS quality
    FROM t
    """,
    tags=("llm", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score: lexical diversity + length-window + token-size
    components (the public heuristic-filter family: C4/Gopher-style
    rules, re-expressed over this corpus' features)."""
    (d,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    nc = F.length("text")
    distinct_ratio = nd.cast("double") / n
    avg_tok = (nc - n + 1).cast("double") / n
    len_ok = F.when((n >= 20) & (n <= 80), 1).otherwise(0)
    quality = F.round(
        distinct_ratio * 0.5
        + F.when((n >= 20) & (n <= 80), 0.3).otherwise(0.0)
        + F.when(avg_tok >= 4.0, 0.2).otherwise(0.0), 6).cast("double")
    return d.select("doc_id", n.alias("n_tokens"),
                    distinct_ratio.alias("distinct_ratio"),
                    avg_tok.alias("avg_token_len"),
                    len_ok.alias("len_ok"),
                    quality.alias("quality"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text)))               AS fingerprint,
           substr(md5(lower(trim(text))), 1, 4) AS bucket,
           length(text)                         AS n_chars_measured
    FROM documents
    """,
    tags=("llm", "text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint (md5 of normalized text) + a
    16-bit prefix bucket — the partition key for shuffle-free exact
    dedup at scale (identical fingerprints land in one bucket)."""
    (d,) = tables(spark, sf_dir, "documents")
    return (d.select("doc_id",
                     F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
                     F.length("text").alias("n_chars_measured"))
            .select("doc_id", "fingerprint",
                    F.substring("fingerprint", 1, 4).alias("bucket"),
                    "n_chars_measured"))


@query(
    "text_chunk",
    oracle="""
    WITH series AS (SELECT unnest(range(0, 64)) AS i)
    SELECT d.doc_id, cast(s.i as bigint) AS chunk_id,
           substr(d.text, cast(s.i * 150 + 1 as int), 200) AS chunk,
           len(substr(d.text, cast(s.i * 150 + 1 as int), 200)) AS chunk_len
    FROM documents d CROSS JOIN series s
    WHERE s.i <= greatest((len(d.text) - 1) // 150, 0)
    """,
    tags=("llm", "text", "chunk"),
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 200-char windows, stride 150
    (50-char overlap) — the standard pre-tokenization step of a
    training-data pipeline.

    Per-row ``sequence`` + ``explode``: fully parallel, no shuffle at
    all (narrow op), chunk count adapts to each document. The oracle
    mirrors it with a bounded series + filter because DuckDB's
    generate_series cannot be correlated.
    """
    (d,) = tables(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr("sequence(0, int(greatest((length(text) - 1) div 150, 0)))")
        ).alias("chunk_id"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.expr("substr(text, chunk_id * 150 + 1, 200)").alias("chunk"),
    )
    return chunks.withColumn("chunk_len", F.length("chunk").cast("long"))


@query(
    "text_bpe_regex_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
             AS n_bpe_tokens,
           coalesce(array_to_string(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')[1:3], '|'), '') AS first3
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization: the GPT-2-family regex shape (letter
    runs | digit runs | single punctuation) restricted to constructs
    portable between Java regex and RE2. Counting + inspection of the
    leftmost matches; the real tokenizer's merge step would run inside
    a pandas batch downstream.

    Empty text => zero tokens and first3 = '' on BOTH engines: DuckDB's
    array_to_string over an empty slice is NULL (coalesced in the
    oracle) while Spark's array_join is '' — found by the registry
    differential fuzz (test_registry_differential.py), invisible on
    the fixed corpus which has no empty documents."""
    (d,) = tables(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"))


@query(
    "text_gopher_filters",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '')
               AS ts
      FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts)-1),
                                   i -> ts[i] || ' ' || ts[i+1])) AS bg
      FROM toks WHERE len(ts) >= 2
    ), cnt AS (
      SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
    ), agg AS (
      SELECT doc_id, max(c) AS top_bg, sum(c) AS tot_bg FROM cnt GROUP BY doc_id
    ), words AS (
      SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
      FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) t GROUP BY doc_id
    )
    SELECT w.doc_id,
           round(cast(a.top_bg AS double) / a.tot_bg, 6) AS top_bigram_frac,
           round(1.0 - cast(w.n_uniq AS double) / w.n_tok, 6) AS dup_word_frac,
           (cast(a.top_bg AS double) / a.tot_bg <= 0.2
            AND 1.0 - cast(w.n_uniq AS double) / w.n_tok <= 0.5) AS keep
    FROM words w JOIN agg a USING (doc_id)
    """,
    tags=("llm", "text", "quality"),
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    fraction of 2-gram mass in the single most frequent bigram, and
    duplicate-word fraction; ``keep`` applies the thresholds. Integer
    counts divided once at the end keep both engines bit-identical.
    Shape at scale: bigram counting is one map-side-combinable groupBy
    keyed (doc_id, bigram); everything else is per-doc arithmetic — no
    cross-document shuffle at all, so it scales linearly with corpus
    size and is safe to fuse ahead of dedup in a curation pipeline."""
    (d,) = tables(spark, sf_dir, "documents")
    # SINGLE-SCAN plan: word-level metrics are per-row array math
    # (size / array_distinct — no explode, no shuffle), and they ride
    # through the bigram aggregation as first() payloads, so the corpus
    # is tokenized once and there is no doc_id self-join. (The prior
    # shape exploded the token stream twice — words + bigrams — and
    # joined; two full scans of 100 TB of text.) Every gated corpus
    # has >= 3 words/doc (test_corpus_every_document_has_three_words),
    # so the size(ts) >= 2 guard never drops a document.
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("ts"),
    ).select(
        "doc_id", "ts",
        F.expr("size(ts)").alias("n_tok"),
        F.expr("size(array_distinct(ts))").alias("n_uniq"),
    )
    big = (
        toks.where(F.expr("size(ts) >= 2"))
        .select(
            "doc_id", "n_tok", "n_uniq",
            F.explode(
                F.expr("transform(sequence(1, size(ts)-1), "
                       "i -> concat(ts[i-1], ' ', ts[i]))")
            ).alias("bg"),
        )
    )
    agg = (
        big.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"),
             F.first("n_tok").alias("n_tok"), F.first("n_uniq").alias("n_uniq"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("tot_bg"),
             F.first("n_tok").alias("n_tok"), F.first("n_uniq").alias("n_uniq"))
    )
    top_frac = F.col("top_bg").cast("double") / F.col("tot_bg")
    dup_frac = F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n_tok")
    return agg.select(
        "doc_id",
        F.round(top_frac, 6).alias("top_bigram_frac"),
        F.round(dup_frac, 6).alias("dup_word_frac"),
        ((top_frac <= 0.2) & (dup_frac <= 0.5)).alias("keep"),
    )


@query(
    "text_ngram_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      FROM documents
    ), big AS (
      SELECT unnest(list_transform(generate_series(1, len(ts)-1),
                                   i -> ts[i] || ' ' || ts[i+1])) AS bg
      FROM toks WHERE len(ts) >= 2
    ), cnt AS (
      SELECT bg, count(*) AS n FROM big GROUP BY bg
    )
    SELECT bg, n FROM (
      SELECT bg, n, row_number() OVER (ORDER BY n DESC, bg) AS rk FROM cnt) t
    WHERE rk <= 20
    """,
    tags=("llm", "text", "ngram"),
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 bigram counts — the corpus-statistics pass behind
    Zipf sanity checks, stopword discovery, and boilerplate detection.
    One map-side-combinable count keyed by bigram, then TakeOrdered
    top-k (per-partition heaps, no global sort); ties break on the
    bigram string so the cut is deterministic."""
    (d,) = tables(spark, sf_dir, "documents")
    big = (
        d.select(F.expr("filter(split(lower(text), ' '), t -> t <> '')")
                  .alias("ts"))
        .where(F.expr("size(ts) >= 2"))
        .select(F.explode(
            F.expr("transform(sequence(1, size(ts)-1), "
                   "i -> concat(ts[i-1], ' ', ts[i]))")).alias("bg"))
    )
    return (
        big.groupBy("bg").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bg"))
        .limit(20)
    )


@query(
    "text_perplexity_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS tok
      FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    vocab AS (SELECT tok, cast(sum(tf) as bigint) AS c FROM tf GROUP BY tok),
    vn AS (SELECT tok, c,
                  cast(sum(c) OVER () as bigint) AS n FROM vocab),
    nll AS (SELECT tok,
                   cast(round(-ln(cast(c as double) / n) * 1000000)
                        as bigint) AS nll_u
            FROM vn)
    SELECT tf.doc_id,
           cast(sum(tf.tf * nll.nll_u) as bigint) AS nll_u_total,
           cast(sum(tf.tf) as bigint)             AS n_tok,
           cast(sum(tf.tf * nll.nll_u) as bigint)
             / (1000000.0 * sum(tf.tf))           AS avg_nll
    FROM tf JOIN nll USING (tok)
    GROUP BY tf.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy (the CCNet-style quality dial): the
    corpus trains a unigram model; each document is scored by its mean
    negative log-likelihood — low = common/natural text, high =
    rare-token garbage. Real pipelines swap in a KenLM; the relational
    shape is identical.

    Determinism: per-token -ln(p) is rounded at 1e-6 and scaled to an
    int64 (micro-nats), so the per-doc total is order-free integer
    math; the single trailing division is one IEEE op (same policy as
    the registry's scaled-integer sums). Shape at scale: ONE tokenize
    pass feeds tf; the vocabulary aggregate is narrow; the corpus
    total is a scalar aggregate crossJoined back as ONE broadcast row
    (never a global window over the vocabulary — a web corpus has
    10^8+ distinct tokens and a partitionBy() window would funnel them
    all through one task); tf joins nll UNHINTED on tok, so planner/
    AQE broadcasts nll while it measures small and key-shuffles both
    sides at web-vocabulary scale. No second scan, no driver collect."""
    (d,) = tables(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.expr(
                         "filter(split(lower(text), ' '), t -> t <> '')"))
                      .alias("tok")))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    vn = vocab.crossJoin(F.broadcast(total))
    nll = vn.select(
        "tok",
        F.expr("cast(round(-ln(cast(c as double) / n) * 1000000) as bigint)")
         .alias("nll_u"))
    return (tf.join(nll, "tok")
            .groupBy("doc_id")
            .agg(F.sum(F.col("tf") * F.col("nll_u")).alias("nll_u_total"),
                 F.sum("tf").alias("n_tok"))
            .select("doc_id", "nll_u_total", "n_tok",
                    (F.col("nll_u_total")
                     / (1e6 * F.col("n_tok"))).alias("avg_nll")))


@query(
    "text_c4_filters",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws,
             text
      FROM documents
    )
    SELECT doc_id,
           cast(len(ws) AS bigint) AS n_words,
           cast(contains(text, '{') OR contains(text, '}') AS boolean)
             AS has_brace,
           cast(contains(lower(text), 'lorem ipsum') AS boolean)
             AS has_lorem,
           cast(contains(lower(text), 'javascript') AS boolean) AS has_js,
           cast(right(text, 1) IN ('.', '!', '?', '"') AS boolean)
             AS ends_punct,
           cast(len(ws) >= 5 AND NOT (contains(text, '{')
                OR contains(text, '}'))
                AND NOT contains(lower(text), 'lorem ipsum')
             AS boolean) AS keep
    FROM t
    """,
    tags=("llm", "text", "quality"),
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, public): minimum word
    count, curly-brace rejection (code/templating), boilerplate phrase
    rejection ('lorem ipsum', 'javascript'), terminal-punctuation
    signal. Complements text_gopher_filters (repetition gates) and
    text_quality_score (ratio dials) — the three public filter suites a
    web-corpus pass actually stacks.

    Pure narrow projection over built-in string predicates: pushes to
    the scan, codegen end-to-end, zero shuffles — at 100 TB this is a
    map-only pass whose cost is the read itself."""
    (d,) = tables(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    has_brace = F.col("text").contains("{") | F.col("text").contains("}")
    has_lorem = lower.contains("lorem ipsum")
    n_words = F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        lower.contains("javascript").alias("has_js"),
        F.expr("right(text, 1)").isin(".", "!", "?", '"').alias("ends_punct"),
        ((n_words >= 5) & ~has_brace & ~has_lorem).alias("keep"))


@query(
    "text_dup_profile",
    oracle="""
    WITH g AS (
      SELECT md5(text) AS fingerprint, count(*) AS copies,
             min(doc_id) AS min_id
      FROM documents GROUP BY md5(text))
    SELECT copies, count(*) AS n_groups,
           cast(sum(copies) AS bigint) AS n_docs,
           cast(sum(min_id) AS bigint) AS min_id_sum
    FROM g GROUP BY copies
    """,
    tags=("llm", "text", "dedup", "stats"),
)
def text_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate multiplicity histogram: how many fingerprint
    groups have 1, 2, 3... copies — the dial read BEFORE running dedup
    (what fraction of the corpus is verbatim duplication, how heavy is
    the tail). Two combinable aggregates: the corpus reduces to
    (fingerprint, count) — 48 bytes/row shuffled regardless of
    document size — then to at most max-multiplicity rows. min_id_sum
    is an integer checksum tying the histogram to the groups it
    summarizes."""
    (d,) = tables(spark, sf_dir, "documents")
    g = (d.groupBy(F.md5("text").alias("fingerprint"))
         .agg(F.count("*").alias("copies"), F.min("doc_id").alias("min_id")))
    return (g.groupBy("copies")
            .agg(F.count("*").alias("n_groups"),
                 F.sum("copies").alias("n_docs"),
                 F.sum("min_id").alias("min_id_sum")))


@query(
    "text_cdc_chunks",
    oracle="""
    WITH chars AS (
      SELECT doc_id, gi.p,
             cast(ascii(substr(text, cast(gi.p as int), 1)) as bigint)
               AS c,
             len(text) AS n
      FROM documents
      CROSS JOIN generate_series(1, 4096) gi(p)
      WHERE gi.p <= len(text)),
    hashed AS (
      SELECT doc_id, p, n,
             lag(c, 3) OVER w * 16777216 + lag(c, 2) OVER w * 65536
             + lag(c, 1) OVER w * 256 + c AS h
      FROM chars WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
    bounds AS (
      SELECT doc_id, p, n FROM hashed
      WHERE p >= 4 AND p < n AND h % 64 = 0),
    lens AS (
      SELECT doc_id, n,
             p - coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0)
               AS clen,
             n - max(p) OVER (PARTITION BY doc_id) AS tail_len
      FROM bounds),
    agg AS (
      SELECT doc_id,
             cast(count(*) + 1 as bigint) AS n_chunks,
             cast(greatest(max(clen), max(tail_len)) as bigint)
               AS max_chunk_len
      FROM lens GROUP BY doc_id)
    SELECT d.doc_id,
           cast(coalesce(a.n_chunks,
                CASE WHEN len(d.text) > 0 THEN 1 ELSE 0 END) as bigint)
             AS n_chunks,
           cast(coalesce(a.max_chunk_len, len(d.text)) as bigint)
             AS max_chunk_len
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "text", "dedup"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rolling-hash cut points, the
    Rabin-Karp/FastCDC primitive): chunk boundaries where a 4-char
    polynomial hash lands on a 6-bit zero residue, so an insertion
    early in a document shifts only the chunks it touches — the
    property that makes CDC the storage-grade sub-document dedup key,
    where fixed-width chunks (text_chunk) resynchronize never.
    Emits per-doc chunk count and max chunk length; a dedup pass
    would hash each chunk (dedup_span_exact's shape) downstream.

    Arrow rolling-hash pass (r11, verdict #4 — the production shape
    the previous docstring promised): ONE mapInPandas over the scan,
    zero shuffles. The per-char posexplode it replaces inflated rows
    1000x and paid a (doc_id)-keyed window exchange plus three lag()
    reads PER CHARACTER; here each Arrow batch's texts become a
    uint32 codepoint array and the 4-gram hash / residue test / chunk
    lengths are whole-array numpy — same boundaries bit-for-bit (the
    DuckDB oracle is unchanged). At 100 TB this is map-only: chunking
    parallelism is the scan partitioning, no exchange at any size.
    """
    import pandas as pd

    (d,) = tables(spark, sf_dir, "documents")

    def chunk_stats(batches):
        import numpy as np
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            n_chunks = np.zeros(len(pdf), np.int64)
            # nullable: NULL text must yield max_chunk_len NULL (the
            # oracle's coalesce(NULL, len(NULL)) is NULL), not 0
            max_len = pd.array([None] * len(pdf), dtype="Int64")
            for i, s in enumerate(pdf["text"]):
                if s is None:
                    continue
                # utf-32-le = one true codepoint per char, matching
                # ascii()/ord() semantics in the oracle
                cp = np.frombuffer(s.encode("utf-32-le"),
                                   np.uint32).astype(np.int64)
                n = cp.size
                if n == 0:
                    max_len[i] = 0   # empty text: coalesce(NULL, 0)
                    continue
                if n >= 4:
                    h = ((cp[:-3] << 24) + (cp[1:-2] << 16)
                         + (cp[2:-1] << 8) + cp[3:])
                    # h[j] is the hash ENDING at 1-based position j+4;
                    # cuts need p in [4, n-1] (never cut at the end)
                    p = np.nonzero(h % 64 == 0)[0] + 4
                    if p.size and p[-1] == n:
                        p = p[:-1]
                else:
                    p = np.empty(0, np.int64)
                if p.size:
                    lens = np.diff(p, prepend=0)
                    n_chunks[i] = p.size + 1
                    max_len[i] = max(int(lens.max()), int(n - p[-1]))
                else:
                    n_chunks[i] = 1
                    max_len[i] = n
            yield pd.DataFrame({"doc_id": ids, "n_chunks": n_chunks,
                                "max_chunk_len": max_len})

    return d.select("doc_id", "text").mapInPandas(
        chunk_stats,
        schema="doc_id long, n_chunks long, max_chunk_len long")
