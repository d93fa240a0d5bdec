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

__all__ = ["REGISTRY", "QueryDef", "query", "tables"]
