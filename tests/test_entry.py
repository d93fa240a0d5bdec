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


def test_registry_prefix_covers_every_category():
    """The driver gates queries() in registration order and may stop
    after a budgeted prefix — every SURVEY section-2 category and LLM
    family must therefore land inside even a small window."""
    from go_triton_spark.operators import REGISTRY, _category

    names = list(REGISTRY)
    assert names[0] == "q1_pricing_summary"  # flagship leads
    all_cats = {_category(qd) for qd in REGISTRY.values()}
    window_cats = {_category(REGISTRY[n]) for n in names[:30]}
    assert window_cats == all_cats


def test_registry_outputs_have_no_narrow_or_array_columns(spark):
    """Driver hash-stability: no int32/float32 (dtype-diverges from the
    DuckDB oracle in pandas) and no array/map outputs (crash the
    driver's canonical sort) in any registered query's schema."""
    from pyspark.sql import types as T

    from go_triton_spark.operators import REGISTRY

    sf = "/root/testdata/sf0.001"
    bad = []
    for name, qd in REGISTRY.items():
        schema = qd.spark(spark, sf).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType,
                                       T.FloatType, T.ArrayType, T.MapType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, bad
