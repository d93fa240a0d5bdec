#!/usr/bin/env python
"""Scale-up experiment: measure how headline operators scale with data.

Synthesizes k-times replicas of the sf0.1 tables (ids offset per copy
so keys stay unique; text/embedding payloads unchanged, which makes
the corpus duplicate-heavy — an adversarial-but-realistic shape for
the dedup/similarity family) under /tmp, then times a representative
query subset at each multiple. The point is the CURVE, not the
absolute numbers: a scale-safe plan grows ~linearly in rows; a hidden
all-pairs or single-task stage grows quadratically or flatlines on
one core.

Usage: python tools/scale_experiment.py [--mults 1,2,5,10] [--out MD]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scale"

# (table, id columns to offset per copy) — fact tables replicate,
# dimension tables copy as-is so FK joins keep matching rows
REPLICATE = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "customer", "supplier", "part"]

QUERIES5 = [
    "emb_outlier_scores",
    "emb_similarity_histogram",
    "curate_semantic_dedup",
    "curate_datacard",
    "asof_join_nearest",
    "text_dup_profile",
    "dedup_levenshtein_qgram",
]

QUERIES4 = [
    "udf_scalar_pandas",
    "udaf_grouped_pandas",
    "grouped_map_demean",
    "udf_map_in_arrow",
    "explode_token_counts",
    "lateral_posexplode",
    "pivot_status_by_priority",
    "window_rank_suite",
    "window_moving_stats",
    "agg_grouping_sets",
    "topk_per_group",
    "profile_columns",
]

QUERIES3 = [
    "dedup_embedding_lsh",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_span_exact",
    "emb_quantize_int8",
    "emb_centroids",
    "ann_topk_ivf",
    "curate_decontaminate",
    "text_perplexity_proxy",
]

QUERIES2 = [
    "sessionize_events",
    "interval_join_sessions",
    "asof_join_events",
    "evt_session_window",
    "curate_pipeline_end_to_end",
    "curate_canonical_docs",
    "dedup_clusters",
    "tfidf_top_terms",
    "text_sequence_pack",
    "q18_large_orders",
]

# round-4 batch: every plan changed by the broadcast-policy /
# grid / q21 rework — proves the new shapes hold the curve
QUERIES6 = [
    "ts_gapfill_ffill",          # per-user sequence grid (no cross join)
    "text_perplexity_proxy",     # scalar-agg total (no vocab window)
    "q21_waiting_supplier",      # orderkey-clustered double aggregate
    "q3_shipping_priority",      # unhinted filtered customer
    "q7_nation_trade_volume",    # unhinted customer + supplier
    "q9_product_profit",         # unhinted part + supplier
    "q18_large_orders",          # unhinted customer
    "q20_heavy_part_suppliers",  # unhinted aggregated heavy-suppliers
    "join_inner",                # unhinted full customer
]

QUERIES = [
    "q1_pricing_summary",        # scan -> partial agg
    "q3_shipping_priority",      # fact-fact join
    "q21_waiting_supplier",      # per-order stats rewrite
    "dedup_exact",               # hash groupBy
    "dedup_minhash_lsh",         # banded candidates + verify
    "dedup_levenshtein",         # size-aware salted blocks
    "text_gopher_filters",       # map-only text pass
    "emb_kmeans",                # broadcast-argmin + tiny shuffle
    "knn_graph_lsh",             # bucket self-join
    "semdedup_prune",            # bucket self-join + decision
    "ann_topk_lsh",              # broadcast query probes
]


def build(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{mult}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    for t in COPY:
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    for t, id_cols in REPLICATE.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        # offset = copy_index * 10^10 keeps ids unique and disjoint
        rep = (df.crossJoin(spark.range(mult).withColumnRenamed("id", "__c")))
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + F.col("__c") * F.lit(10_000_000_000))
        (rep.drop("__c")
            .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def _shuffle_totals(spark):
    """Cumulative shuffle write/read bytes over all completed stages,
    via the status REST API (needs spark.ui.enabled=true — main()
    turns it on through SPARK_GRAFT_EXTRA_CONFS). Per-query deltas of
    this are the 'exchange bytes vs N' column the r11 verdict asked
    for on the similarity family. Returns None when the UI is off."""
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    try:
        apps = _json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications", timeout=5))
        app_id = apps[0]["id"]
        stages = _json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10))
        return (sum(s.get("shuffleWriteBytes", 0) for s in stages),
                sum(s.get("shuffleReadBytes", 0) for s in stages))
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return None


def main() -> int:
    global QUERIES
    # UI on for this process so _shuffle_totals can read stage metrics
    # _shuffle_totals is a CUMULATIVE sum over retained stages: if
    # the status store evicts stages between the before/after
    # snapshots (default retainedStages=1000, easily crossed by a
    # multi-replica batch run in one session), deltas silently
    # under-report or go negative (r12 review). Each conf is added
    # only when absent, INDEPENDENTLY — a pre-existing
    # spark.ui.enabled in the env must not disable the retention fix.
    confs = os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "")
    for kv in ("spark.ui.enabled=true",
               "spark.ui.retainedStages=100000",
               "spark.ui.retainedJobs=100000"):
        if kv.split("=")[0] not in confs:
            confs = (confs + ";" if confs else "") + kv
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = confs
    if "--batch2" in sys.argv:
        QUERIES = QUERIES2
    if "--batch3" in sys.argv:
        QUERIES = QUERIES3
    if "--batch4" in sys.argv:
        QUERIES = QUERIES4
    if "--batch5" in sys.argv:
        QUERIES = QUERIES5
    if "--batch6" in sys.argv:
        QUERIES = QUERIES6
    if "--queries" in sys.argv:  # explicit list for targeted re-runs
        QUERIES = sys.argv[sys.argv.index("--queries") + 1].split(",")
    mults = [int(x) for x in (
        sys.argv[sys.argv.index("--mults") + 1].split(",")
        if "--mults" in sys.argv else ["1", "2", "5", "10"])]

    from go_triton_spark.session import get_spark
    from go_triton_spark.operators import REGISTRY

    spark = get_spark("go-triton-spark-scale")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    shuffles: dict[str, dict[int, dict]] = {q: {} for q in QUERIES}
    for m in mults:
        sf_dir = build(spark, m) if m != 1 else BASE
        for q in QUERIES:
            s0 = _shuffle_totals(spark)
            t0 = time.time()
            REGISTRY[q].spark(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            results[q][m] = round(time.time() - t0, 2)
            s1 = _shuffle_totals(spark) if s0 is not None else None
            extra = ""
            if s0 is not None and s1 is not None:
                dw, dr = s1[0] - s0[0], s1[1] - s0[1]
                if dw < 0 or dr < 0:
                    # status store evicted stages between snapshots:
                    # the delta is garbage — say so in the artifact
                    # instead of recording an understated number
                    extra = " shuffle=EVICTED"
                else:
                    mb = round(dw / 1e6, 1)
                    shuffles[q][m] = {"write_mb": mb,
                                      "read_mb": round(dr / 1e6, 1)}
                    extra = f" shuffle_write={mb}MB"
            print(f"x{m} {q}: {results[q][m]}s{extra}", flush=True)
    print(json.dumps({"wall_s": results, "shuffle": shuffles}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
