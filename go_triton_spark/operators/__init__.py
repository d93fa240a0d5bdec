"""Operator inventory: every query the engine exposes, with DuckDB oracles.

Importing this package populates the registry (see registry.py). Modules:

- relational.py       : SURVEY section 2.2 — joins, aggs, windows, set ops,
                        scalar function families (all built-in Catalyst)
- pipeline_queries.py : SURVEY section 2.1 batch-expressible operators
                        (S12/S13/S15/S17/S18) over the events table
- dedup.py            : exact + MinHash-LSH + SimHash + n-gram Jaccard +
                        embedding-cosine near-duplicate detection
- similarity.py       : brute-force and LSH-bucketed ANN top-k
- text.py             : language-ID, quality scoring, token counts,
                        document fingerprinting
- multimodal.py       : binary-column plumbing (decode/feature stubs)
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
from go_triton_spark.operators import curation  # noqa: F401,E402
from go_triton_spark.operators import interval_join  # noqa: F401,E402


def _category(qd) -> str:
    """Coverage category for gate ordering (LLM families split out)."""
    tags = qd.tags or ("misc",)
    if "llm" in tags:
        rest = [t for t in tags if t != "llm"]
        return "llm-" + (rest[0] if rest else "misc")
    return tags[0]


def _reorder_registry() -> None:
    """Rebuild REGISTRY so every category appears within ANY prefix.

    The driver's correctness gate walks ``queries()`` in registration
    order and may stop after a budgeted prefix (round 1 stopped at 50 of
    137, leaving whole families unchecked). Round-robin across
    categories guarantees a prefix of k*n_categories queries covers
    every category ~k times. The flagship stays first.
    """
    by_cat: dict[str, list] = {}
    for name, qd in REGISTRY.items():
        by_cat.setdefault(_category(qd), []).append(name)
    order = ["q1_pricing_summary"]
    cats = sorted(by_cat)
    idx = {c: 0 for c in cats}
    while len(order) < len(REGISTRY):
        for c in cats:
            names = by_cat[c]
            while idx[c] < len(names) and names[idx[c]] in order:
                idx[c] += 1
            if idx[c] < len(names):
                order.append(names[idx[c]])
                idx[c] += 1
    reordered = {name: REGISTRY[name] for name in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_reorder_registry()

__all__ = ["REGISTRY", "QueryDef", "query", "tables"]
