"""Physical-plan regression tests: the plan shapes that make the
engine scale must survive refactors.

These assert the properties the 100 TB design depends on (SURVEY
section 4): column pruning, predicate pushdown to the parquet scan,
top-k as TakeOrderedAndProject (never a global sort), broadcast
dimension joins, partition pruning on the archive table.
"""

import pytest

from go_triton_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (REGISTRY[name].spark(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "q6_revenue_forecast")
    # only the 4 needed columns reach the scan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_quantity" in scan and "l_extendedprice" in scan
    assert "l_orderkey" not in scan, "column pruning failed"
    # all predicates pushed to the scan
    assert "l_shipdate" in scan and "l_discount" in scan


def test_q1_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    for needed in ("l_returnflag", "l_linestatus", "l_quantity"):
        assert needed in scan
    assert "l_partkey" not in scan and "l_suppkey" not in scan


def test_topk_is_take_ordered_not_global_sort(spark):
    for name in ("sort_limit", "q3_shipping_priority"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, f"{name}: no TakeOrderedAndProject"


def test_dimension_joins_broadcast(spark):
    for name in ("q3_shipping_priority", "q5_nation_revenue", "join_inner"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"


def test_prefix_filter_pushed(spark):
    plan = _plan(spark, "s13_prefix_filter")
    assert "StartsWith" in plan


def test_window_topk_single_shuffle(spark):
    # top-k per group: exactly one exchange (on the partition key)
    plan = _plan(spark, "window_row_number")
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "Reused" not in l]
    assert len(exchanges) == 1, f"expected 1 shuffle, saw {len(exchanges)}"


def test_agg_has_partial_phase(spark):
    # map-side combine before the shuffle
    plan = _plan(spark, "agg_basic")
    assert "partial_count" in plan or "partial" in plan.lower()
