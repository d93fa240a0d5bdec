"""Results must not depend on parallelism: every aggregate uses exact
decimal sums and every ranking a total order (registry.py policy), so
rerunning at a different shuffle-partition count must produce identical
rows. This is the property that lets a 100 TB cluster repartition
freely (AQE, scale-up, skew splitting) without changing answers."""

import pytest

from go_triton_spark.operators import REGISTRY

# one representative per shape: agg, window, join, dedup, text, pipeline
REPRESENTATIVES = [
    "q1_pricing_summary",
    "agg_regression",
    "window_moving_stats",
    "sessionize_events",
    "dedup_minhash_lsh",
    "tfidf_top_terms",
    "curate_pipeline_end_to_end",
    "dedup_levenshtein",        # size-aware salted join + pinned width
    "text_sequence_pack",       # per-lang running sum
    "curate_language_balance",  # integer-weight targets + hash order
    "emb_kmeans",               # decimal re-center means + rounded argmin
    "knn_graph_lsh",            # grouped-pair LSH gen + total-order rank
    "ts_gapfill_ffill",         # per-user sequence grid + fill window
    "text_perplexity_proxy",    # scalar-agg corpus total, micro-nat ints
    "q21_waiting_supplier",     # orderkey-clustered double aggregate
    "mm_wav_decode",            # Arrow-batch WAV parse, integer stats
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_stable_across_shuffle_partitions(spark, sf_dir, name):
    qd = REGISTRY[name]
    base = sorted(map(tuple, qd.spark(spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = sorted(map(tuple, qd.spark(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
