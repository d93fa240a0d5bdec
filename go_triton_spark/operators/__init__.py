"""Operator inventory: every query the engine exposes, with DuckDB oracles.

Importing this package populates the registry (see registry.py). Modules:

- relational.py       : SURVEY section 2.2 — joins, aggs, windows, set ops,
                        scalar function families (all built-in Catalyst)
- pipeline_queries.py : SURVEY section 2.1 batch-expressible operators
                        (S12/S13/S15/S17/S18) over the events table
- dedup.py            : exact + MinHash-LSH + SimHash + n-gram Jaccard +
                        embedding-cosine + Levenshtein (salted and q-gram
                        prefix-filter routes) + token-span dedup
- similarity.py       : ANN top-k (brute force / LSH / IVF), kNN graph,
                        SemDeDup pruning, k-means, outlier scores,
                        int8 quantization, similarity histogram
- text.py             : language-ID, quality scoring, token counts,
                        fingerprinting, Gopher/C4 filters, perplexity
                        proxy, n-gram counts, dup profile
- curation.py         : quota sampling, decontamination, PII scrub,
                        canonical docs, semantic dedup, fused pipeline
- training.py         : train/val split, language balancing, data-mix
                        apportionment, sequence packing
- timeseries.py       : as-of joins (backward/forward/nearest),
                        gap-fill, funnel, cohort, sessionize
- multimodal.py       : binary-column plumbing (decode/feature stubs)
- sketches.py         : mergeable KMV/theta distinct-count sketches
                        (exact-integer estimator, shard-merge proof)
"""

from go_triton_spark.operators.registry import REGISTRY, QueryDef, query, tables

from go_triton_spark.operators import relational  # noqa: F401,E402
from go_triton_spark.operators import relational2  # noqa: F401,E402
from go_triton_spark.operators import relational3  # noqa: F401,E402
from go_triton_spark.operators import relational4  # noqa: F401,E402
from go_triton_spark.operators import relational_tpch  # noqa: F401,E402
from go_triton_spark.operators import scalars  # noqa: F401,E402
from go_triton_spark.operators import event_time  # noqa: F401,E402
from go_triton_spark.operators import udfs  # noqa: F401,E402
from go_triton_spark.operators import timeseries  # noqa: F401,E402
from go_triton_spark.operators import pipeline_queries  # noqa: F401,E402
from go_triton_spark.operators import dedup  # noqa: F401,E402
from go_triton_spark.operators import similarity  # noqa: F401,E402
from go_triton_spark.operators import text  # noqa: F401,E402
from go_triton_spark.operators import multimodal  # noqa: F401,E402
from go_triton_spark.operators import perceptual  # noqa: F401,E402
from go_triton_spark.operators import curation  # noqa: F401,E402
from go_triton_spark.operators import training  # noqa: F401,E402
from go_triton_spark.operators import interval_join  # noqa: F401,E402
from go_triton_spark.operators import sketches  # noqa: F401,E402
from go_triton_spark.operators import ingest  # noqa: F401,E402


def _category(qd) -> str:
    """Coverage category for gate ordering (LLM families split out)."""
    tags = qd.tags or ("misc",)
    if "llm" in tags:
        rest = [t for t in tags if t != "llm"]
        return "llm-" + (rest[0] if rest else "misc")
    return tags[0]


def _driver_green_rounds() -> dict:
    """Last round each name was fully green in CORRECTNESS_r*.json.

    The driver's correctness gate walks ``queries()`` in registration
    order and stops after a budgeted prefix (~50 of 159), so one round
    can't gate everything. Each round we front-load first the queries
    that have never earned a green (rows+schema+hash) row, then the
    STALEST greens (oldest last-green round first), so the union of
    rounds converges to full coverage AND no query's latest check
    drifts arbitrarily far behind plan changes. Reading the artifacts
    at import time keeps this self-maintaining — no per-round edit.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    green: dict = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if (isinstance(rec, dict) and rec.get("rows_match")
                    and rec.get("schema_match") and rec.get("hash_match")):
                green[name] = max(green.get(name, 0), rnd)
    return green


# Queries whose PHYSICAL PLAN changed materially in the noted round,
# after their last driver-green check — staleness ordering can't see
# plan edits, so these front-load right after the never-green tier
# until the gate re-greens them. Self-clearing: once a name's last
# driver-green round reaches the noted round, the entry is ignored
# (safe to leave behind; prune opportunistically).
_PLAN_CHANGED = {
    # (r9 entries pruned in r10: every one re-greened in
    # CORRECTNESS_r09, making them self-cleared no-ops.)
    #
    # r11: the per-char posexplode + window stack was replaced by a
    # single map-only Arrow rolling-hash pass (verdict #4) — same
    # boundaries, new physical plan.
    "text_cdc_chunks": 11,
    # r11: probe CTE now distincts tokens BEFORE bucket explode
    # (mirrors the oracle; 4x less probe-side shuffle at scale).
    "sketch_cms_heavy_hitters": 11,
    # r11: re-center reads `sub` straight from the assignment pass
    # instead of shuffle-joining the corpus onto itself (8->7
    # exchanges, 3->2 joins in the executed plan).
    "emb_pq_codes": 11,
}


def _reorder_registry() -> None:
    """Rebuild REGISTRY: flagship, never-green, plan-changed, then
    stalest-green first.

    Within each priority tier (never-checked, then each last-green
    round ascending) we round-robin across categories so any prefix
    keeps category spread. Order only affects WHICH queries the
    driver's budgeted prefix checks — never what any query returns.
    """
    green = _driver_green_rounds()

    def rr(names_by_cat: dict) -> list:
        out: list = []
        cats = sorted(names_by_cat)
        idx = {c: 0 for c in cats}
        total = sum(len(v) for v in names_by_cat.values())
        while len(out) < total:
            for c in cats:
                if idx[c] < len(names_by_cat[c]):
                    out.append(names_by_cat[c][idx[c]])
                    idx[c] += 1
        return out

    # tier 0 = never driver-green; tier 0.5 = plan changed since last
    # green; tier r = last green in round r
    tiers: dict = {}
    for name, qd in REGISTRY.items():
        if name == "q1_pricing_summary":
            continue
        last = green.get(name, 0)
        tier: float = last
        if last and last < _PLAN_CHANGED.get(name, 0):
            tier = 0.5
        tiers.setdefault(tier, {}) \
             .setdefault(_category(qd), []).append(name)
    order = ["q1_pricing_summary"]
    for rnd in sorted(tiers):
        order.extend(rr(tiers[rnd]))
    reordered = {name: REGISTRY[name] for name in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_reorder_registry()

__all__ = ["REGISTRY", "QueryDef", "query", "tables"]
