"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry
(go_triton_spark/operators/) for the sf0.01 DuckDB-oracle gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_session_confs(spark: SparkSession) -> None:
    """Settings the engine needs when the driver owns the session."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — session.py's builder path sets them


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from go_triton_spark.operators import REGISTRY

    _ensure_session_confs(spark)
    return REGISTRY["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md section 2)."""
    from go_triton_spark.operators import REGISTRY

    out: dict[str, Callable] = {}
    for name, qd in REGISTRY.items():
        def run(spark: SparkSession, sf_dir: str, _qd=qd) -> DataFrame:
            _ensure_session_confs(spark)
            return _qd.spark(spark, sf_dir)
        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted -> rows-only check)."""
    from go_triton_spark.operators import REGISTRY

    return {name: qd.oracle for name, qd in REGISTRY.items()
            if qd.oracle is not None}
