"""Property and invariant tests for the part-4 relational operators:
sessionization (gap invariants on generated timelines) and
hash-stratified sampling (partitioning independence). Mirrors the
reference's test stance of deterministic in-memory fixtures
(triton/test_util.go) upgraded with property-based generation."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_triton_spark.operators.relational4 import (
    sample_stratified_hash, sessionize,
)

EPOCH = dt.datetime(2026, 1, 1)


def _expected_sessions(gaps_s):
    """Session count for one key given inter-event gaps in seconds."""
    return 1 + sum(1 for g in gaps_s if g > 1800)


@settings(max_examples=8, deadline=None)
@given(
    gaps=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=1800),       # same session
            st.integers(min_value=1801, max_value=90000),   # session break
            st.floats(min_value=1799.5, max_value=1801.5),  # boundary zone
        ),
        min_size=0, max_size=24,
    )
)
def test_sessionize_gap_property(spark, gaps):
    ts, rows = EPOCH, []
    for i, g in enumerate([0] + list(gaps)):
        ts = ts + dt.timedelta(seconds=g)
        rows.append((1, ts, i))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize(df, "user_id", "ts", "event_id").collect()
    n_sessions = len({r.sess_id for r in out})
    assert n_sessions == _expected_sessions(gaps)
    # session ids are 1..n and ordered with time
    by_time = sorted(out, key=lambda r: (r.ts, r.event_id))
    sess_seq = [r.sess_id for r in by_time]
    assert sess_seq == sorted(sess_seq)
    assert sess_seq[0] == 1 and sess_seq[-1] == n_sessions


def test_sessionize_ties_share_session(spark):
    rows = [(1, EPOCH, 0), (1, EPOCH, 1),
            (1, EPOCH + dt.timedelta(seconds=3600), 2),
            (1, EPOCH + dt.timedelta(seconds=3600), 3)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {r.event_id: r.sess_id for r in
           sessionize(df, "user_id", "ts", "event_id").collect()}
    assert out[0] == out[1] and out[2] == out[3] and out[0] != out[2]


def test_sessionize_fractional_boundary(spark):
    # 1800.5s gap must break the session (exceeds 1800s), even though
    # truncation to whole seconds would say 1800
    rows = [(1, EPOCH, 0),
            (1, EPOCH + dt.timedelta(seconds=1800, microseconds=500000), 1),
            (2, EPOCH, 2),
            (2, EPOCH + dt.timedelta(seconds=1800), 3)]  # exactly 1800: same
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {r.event_id: r.sess_id for r in
           sessionize(df, "user_id", "ts", "event_id").collect()}
    assert out[0] != out[1]
    assert out[2] == out[3]


def test_stratified_sample_partitioning_independent(spark, sf_dir):
    base = sorted(map(tuple, sample_stratified_hash(spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = sorted(map(tuple, sample_stratified_hash(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
    # ~10% rate with slack: the multiplicative hash spreads doc_ids
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_sampled = sum(r[1] for r in base)
    assert 0.03 * n_docs <= n_sampled <= 0.25 * n_docs
