"""Driver-contract smoke tests."""

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles).issubset(set(qs))
    # spot-run one query at smoke scale
    df = qs["agg_basic"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
