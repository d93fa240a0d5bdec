"""local_df: JVM LocalRelation builder for literal dim tables (r12).

The optimization it pins: spark.createDataFrame(list) plans as a Scan
ExistingRDD over applySchemaToPythonRDD, re-evaluated through Python
workers on EVERY action (~7 cpu_s per action for a 5-row table at
local[32]). local_df renders the same rows as a VALUES clause, which
Catalyst folds into a LocalRelation — zero Python boundary. These tests
pin (a) bit-exact value parity with the createDataFrame form it
replaced, (b) the LocalTableScan plan shape at both converted call
sites, (c) the edge values the repr round-trip must survive.
"""

import math
import struct

from go_triton_spark.operators.registry import local_df


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


# doubles whose decimal rendering is easy to get subtly wrong
_EDGE_DOUBLES = [
    0.0, -0.0, 1.0, -1.0, 1 / 3, math.pi, 1e9, 1e-9,
    5e-324,                       # smallest subnormal
    2.2250738585072014e-308,      # smallest normal
    1.7976931348623157e308,       # largest finite
    0.1, -0.1, 123456.789,
    float("nan"), float("inf"), float("-inf"),
]


def test_local_df_doubles_bit_exact(spark):
    rows = [(i, v) for i, v in enumerate(_EDGE_DOUBLES)]
    got = (local_df(spark, rows, [("i", "int"), ("v", "double")])
           .orderBy("i").collect())
    assert len(got) == len(_EDGE_DOUBLES)
    for r, want in zip(got, _EDGE_DOUBLES):
        assert _bits(r["v"]) == _bits(want), (r["v"], want)


def test_local_df_matches_createdataframe(spark):
    """Value parity with the createDataFrame form local_df replaced,
    over every cell type the two converted call sites use (strings with
    quote/backslash, doubles, ints, double arrays, NULL, bool)."""
    rows = [
        ("it's a 'band'", 0.0, 1, [1.5, -0.0, 1 / 3], None, True),
        ("back\\slash\nnewline", -50000.25, -7, [], 2.5, False),
        ("plain", 1e9, 2**40, [5e-324], None, None),
    ]
    cols = [("s", "string"), ("d", "double"), ("i", "bigint"),
            ("arr", "array<double>"), ("opt", "double"), ("b", "boolean")]
    via_local = local_df(spark, rows, cols).orderBy("i").collect()
    via_cdf = (spark.createDataFrame(
        rows, ", ".join(f"{n} {t}" for n, t in cols))
        .orderBy("i").collect())
    assert [tuple(r) for r in via_local] == [tuple(r) for r in via_cdf]


def test_local_df_plan_is_local_relation(spark):
    df = local_df(spark, [("a", 1.0)], [("k", "string"), ("v", "double")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_local_df_empty_rows(spark):
    df = local_df(spark, [], [("k", "string"), ("v", "double")])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_converted_query_plans_have_no_python_rdd_scan(spark, sf_dir):
    """join_range and ann_topk_ivf were the two bench-path queries whose
    literal dim tables planned as Python-RDD scans; pin the fix."""
    from go_triton_spark.operators import REGISTRY

    for name in ("join_range", "ann_topk_ivf"):
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" not in plan, name
        assert "LocalTableScan" in plan, name
