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


_PKG_SHIPPED = False


def _ensure_session_confs(spark: SparkSession) -> None:
    """Settings the engine needs when the driver owns the session."""
    global _PKG_SHIPPED
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — session.py's builder path sets them
    if not _PKG_SHIPPED:
        # mapInPandas closures import go_triton_spark on executors; ship
        # the package so a session created elsewhere still resolves it
        try:
            import shutil
            import tempfile

            here = os.path.dirname(os.path.abspath(__file__))
            zip_base = os.path.join(tempfile.gettempdir(), "go_triton_spark_pkg")
            zip_path = shutil.make_archive(
                zip_base, "zip", root_dir=here, base_dir="go_triton_spark")
            spark.sparkContext.addPyFile(zip_path)
        except Exception:
            pass  # local path already importable (tests, bench)
        _PKG_SHIPPED = True


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
