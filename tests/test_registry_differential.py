"""Registry-level differential fuzz: run REGISTRY queries AND their
DuckDB oracles over GENERATED documents corpora, not the fixed
testdata — the driver's own gate, pointed at adversarial inputs
(empty strings, unicode, punctuation runs, exact duplicates, single
docs, all-identical langs).

This closes the gap between the operator-level differential suite
(test_differential_random.py: hand-written Spark vs hand-written SQL)
and the gate (fixed corpus): here the EXACT production query and its
EXACT shipped oracle face inputs the fixed corpus never contains. A
mismatch means the operator and its oracle disagree on real data
shapes — the bug class the gate cannot see.
"""

import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_triton_spark.operators import REGISTRY

# text with adversarial shapes: whitespace runs, unicode, digits,
# punctuation, repeated tokens; '|' excluded (feature separator)
_WORD = st.one_of(
    st.text(alphabet="abcdefg", min_size=1, max_size=8),
    st.sampled_from(["the", "THE", "über", "naïve", "日本語", "3.14",
                     "x@y.z", "...", "!!!", "a-b", "word,", "(paren)"]),
)
_TEXT = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(_WORD, min_size=1, max_size=25).map(" ".join),
    st.lists(st.just("dup dup dup"), min_size=1, max_size=5).map(" ".join),
)
_LANG = st.sampled_from(["en", "de", "zh", "es", "fr"])

DOC_ROWS = st.lists(
    st.tuples(_TEXT, _LANG, st.sampled_from(["web", "book", "code"])),
    min_size=1, max_size=25)

# Queries over `documents` whose outputs are deterministic on ANY
# corpus (no sampling thresholds tied to corpus statistics, no
# LSH banding randomness — those have their own recall tests).
FUZZED_QUERIES = [
    "text_token_count",
    "text_fingerprint",
    "text_chunk",
    "dedup_exact",
    "dedup_span_exact",
    "text_ngram_counts",
    "mm_binary_metadata",
    "text_sequence_pack",
    "text_language_id",
    "text_quality_score",
    "text_bpe_regex_tokens",
    "text_gopher_filters",
    "text_c4_filters",
    "text_dup_profile",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "curate_pii_scrub",
]

_SETTINGS = settings(max_examples=8, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow,
                                            HealthCheck.data_too_large])


def _materialize(tmpdir: str, rows) -> str:
    """Write a minimal sf-dir with ONLY documents.parquet (the fuzzed
    queries read nothing else) in the exact testdata schema."""
    pdf = pd.DataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    os.makedirs(tmpdir, exist_ok=True)
    pdf.to_parquet(os.path.join(tmpdir, "documents.parquet"), index=False)
    return tmpdir


def _canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    out = df[cols]
    rows = []
    for r in out.values.tolist():
        rows.append(tuple(
            None if pd.isna(x)
            else round(float(x), 6) if isinstance(x, float)
            else int(x) if isinstance(x, (int,)) and not isinstance(x, bool)
            else x
            for x in r))
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def _fuzz_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("regfuzz"))


@_SETTINGS
@given(rows=DOC_ROWS)
def test_registry_queries_match_their_oracles_on_generated_corpora(
        spark, _fuzz_dir, rows):
    import shutil
    import uuid

    sf_dir = _materialize(
        os.path.join(_fuzz_dir, uuid.uuid4().hex[:12]), rows)
    try:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
        for name in FUZZED_QUERIES:
            qd = REGISTRY[name]
            got = qd.spark(spark, sf_dir).toPandas()
            want = con.execute(qd.oracle).df()
            assert sorted(got.columns) == sorted(want.columns), name
            assert _canon(got) == _canon(want), (
                f"{name} diverged from its oracle on generated corpus "
                f"({len(rows)} docs)")
        con.close()
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


# ---- embeddings-family fuzz ------------------------------------------

import numpy as np

EMB_DIM = 64

# Deterministic emb queries (exact thresholds / twin oracles with
# pinned tie-breaks); the banded/IVF recall paths have their own
# planted-neardup tests.
EMB_FUZZED = [
    "dedup_embedding_cosine",
    "emb_quantize_int8",
    "emb_similarity_histogram",
    "emb_centroids",
]


def _vec_strategy():
    base = st.sampled_from([
        "unit_x", "unit_y", "neg_x", "dup_a", "dup_a2", "tiny", "mixed"])
    return base


def _vec_of(kind: str, i: int):
    v = np.zeros(EMB_DIM, dtype=np.float32)
    if kind == "unit_x":
        v[0] = 1.0
    elif kind == "unit_y":
        v[1] = 1.0
    elif kind == "neg_x":
        v[0] = -1.0
    elif kind in ("dup_a", "dup_a2"):   # exact duplicates across rows
        v[: 4] = [0.5, -0.25, 0.125, 1.0]
    elif kind == "tiny":
        v[2] = 1e-4
    else:  # mixed, row-dependent but deterministic
        v[: 8] = [((i * 7 + j * 3) % 11 - 5) / 4.0 for j in range(8)]
    return v


@_SETTINGS
@given(kinds=st.lists(_vec_strategy(), min_size=2, max_size=12))
def test_embedding_queries_match_oracles_on_generated_vectors(
        spark, _fuzz_dir, kinds):
    """Adversarial vector corpora: exact duplicates, near-zero norms,
    antipodal pairs, tie-heavy similarity structure. NOTE the
    deliberate exclusion of true all-zero vectors: cosine over a
    zero-norm vector is undefined (0/0) and the engine contract —
    like the oracle's — is that upstream curation drops them;
    'tiny' (1e-4 norm) stands in for the nearly-degenerate case."""
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = os.path.join(_fuzz_dir, "emb" + uuid.uuid4().hex[:12])
    os.makedirs(sf_dir, exist_ok=True)
    vecs = [_vec_of(k, i) for i, k in enumerate(kinds)]
    table = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
    })
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    try:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")
        for name in EMB_FUZZED:
            qd = REGISTRY[name]
            got = qd.spark(spark, sf_dir).toPandas()
            want = con.execute(qd.oracle).df()
            assert sorted(got.columns) == sorted(want.columns), name
            assert _canon(got) == _canon(want), (
                f"{name} diverged on generated vectors ({kinds})")
        con.close()
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


# ---- events/timeseries-family fuzz -----------------------------------

import datetime as _dt

EVT_FUZZED = [
    "sessionize_events",
    "funnel_click_to_purchase",
    "cohort_weekly_retention",
    "ts_gapfill_ffill",
    "asof_join_events",
    "evt_tumbling_window",
    "evt_session_window",
]

_BASE_TS = _dt.datetime(2024, 3, 1, 0, 0, 0)

# offsets chosen to hammer the boundaries: exact 30-min session gaps,
# same-timestamp ties, single-event users, week/window edges
_OFFSET_S = st.sampled_from([
    0, 1, 59, 60, 1799, 1800, 1801,           # session-gap boundary
    3600, 3599, 86400, 86400 * 7,             # hour/day/week edges
    0,                                        # duplicate instant
])
_ETYPE = st.sampled_from(["click", "view", "purchase", "error"])

EVT_ROWS = st.lists(
    st.tuples(st.integers(0, 3), _OFFSET_S, _ETYPE),
    min_size=1, max_size=20)


@_SETTINGS
@given(rows=EVT_ROWS)
def test_event_queries_match_oracles_on_generated_events(
        spark, _fuzz_dir, rows):
    """Adversarial event streams: same-instant ties, events exactly ON
    the 30-min session boundary, single-event users, week-edge
    cohorts. Sessionization/funnel/cohort/gap-fill/as-of/windows must
    agree with their oracles on every corner the smooth testdata
    timeline never produces."""
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = os.path.join(_fuzz_dir, "evt" + uuid.uuid4().hex[:12])
    os.makedirs(sf_dir, exist_ok=True)
    ts = [_BASE_TS + _dt.timedelta(seconds=off + uid * 7)
          for uid, off, _ in rows]
    table = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([uid for uid, _, _ in rows], pa.int64()),
        "event_type": pa.array([et for _, _, et in rows], pa.string()),
        "value": pa.array([float(i) for i in range(len(rows))],
                          pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    try:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
        for name in EVT_FUZZED:
            qd = REGISTRY[name]
            got = qd.spark(spark, sf_dir).toPandas()
            want = con.execute(qd.oracle).df()
            assert sorted(got.columns) == sorted(want.columns), name
            assert _canon(got) == _canon(want), (
                f"{name} diverged on generated events "
                f"({len(rows)} rows: {rows})")
        con.close()
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
