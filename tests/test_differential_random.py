"""Randomized differential testing: Spark vs DuckDB on GENERATED
tables (hypothesis), not just the fixed testdata — the same
engine-vs-oracle comparison the driver gate runs, but over adversarial
row sets (nulls, duplicates, empty groups, negative keys, ties).

Scope is the deterministic relational core: grouped aggregation,
window ranking with total-order ties, joins (inner/left/anti),
distinct, and top-k. Float sums are excluded on purpose — summation
order differs across engines; integer/min/max/count aggregates are
exact everywhere.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(-3, 3)
VALS = st.one_of(st.none(), st.integers(-1000, 1000))
TAGS = st.sampled_from(["a", "b", "c", None])

ROWS = st.lists(st.tuples(KEYS, VALS, TAGS), min_size=0, max_size=40)

_SETTINGS = settings(max_examples=20, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


def _frames(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "tag"])
    pdf["k"] = pdf["k"].astype("int64") if len(pdf) else pdf["k"]
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notnull(pdf), None),
        "k long, v long, tag string") if len(pdf) else \
        spark.createDataFrame([], "k long, v long, tag string")
    con = duckdb.connect()
    con.register("t", pdf.astype({"k": "int64"} if len(pdf) else {}))
    return sdf, con


def _canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    out = df[cols]
    for c in cols:  # nullable ints come back as float64 from pandas agg
        if out[c].dtype == "float64":
            out = out.assign(**{c: out[c].astype("Int64")})
    rows = [tuple(None if pd.isna(x) else int(x) if isinstance(
        x, (int, float)) and not isinstance(x, bool) else x for x in r)
        for r in out.values.tolist()]
    return sorted(rows, key=repr)


@_SETTINGS
@given(ROWS)
def test_grouped_aggregation_parity(spark, rows):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = (sdf.groupBy("k")
           .agg(F.count("*").alias("n"), F.count("v").alias("nv"),
                F.sum("v").alias("sv"), F.min("v").alias("mn"),
                F.max("v").alias("mx"))
           .toPandas())
    want = con.execute(
        "SELECT k, count(*) AS n, count(v) AS nv, sum(v) AS sv, "
        "min(v) AS mn, max(v) AS mx FROM t GROUP BY k").df()
    assert _canon(got) == _canon(want)


@_SETTINGS
@given(ROWS)
def test_window_rank_total_order_parity(spark, rows):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    sdf, con = _frames(spark, rows)
    w = Window.partitionBy("k").orderBy(
        F.desc_nulls_last("v"), F.asc_nulls_first("tag"))
    got = (sdf.withColumn("rn", F.row_number().over(w))
           .withColumn("rnk", F.rank().over(w)).toPandas())
    want = con.execute(
        "SELECT k, v, tag, "
        "row_number() OVER w AS rn, rank() OVER w AS rnk FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY v DESC NULLS LAST, "
        "tag ASC NULLS FIRST)").df()
    # row_number is only deterministic when the order is total; make
    # ties impossible to mis-compare by checking the rank columns per
    # exact (k, v, tag) multiset instead of positionally
    assert _canon(got[["k", "v", "tag", "rnk"]]) \
        == _canon(want[["k", "v", "tag", "rnk"]])
    assert sorted(got["rn"]) == sorted(want["rn"])


@_SETTINGS
@given(ROWS, ROWS)
def test_join_parity(spark, left_rows, right_rows):
    sdf_l, con = _frames(spark, left_rows)
    pdf_r = pd.DataFrame(right_rows, columns=["k", "v2", "tag2"])
    sdf_r = spark.createDataFrame(
        pdf_r.astype(object).where(pd.notnull(pdf_r), None),
        "k long, v2 long, tag2 string") if len(pdf_r) else \
        spark.createDataFrame([], "k long, v2 long, tag2 string")
    con.register("r", pdf_r)

    for how, sql in (
        ("inner", "SELECT t.k, t.v, r.v2 FROM t JOIN r USING (k)"),
        ("left", "SELECT t.k, t.v, r.v2 FROM t LEFT JOIN r USING (k)"),
        ("left_anti", "SELECT t.k, t.v FROM t ANTI JOIN r USING (k)"),
    ):
        if how == "left_anti":
            got = sdf_l.join(sdf_r, "k", how).select("k", "v").toPandas()
        else:
            got = (sdf_l.join(sdf_r, "k", how)
                   .select("k", "v", "v2").toPandas())
        want = con.execute(sql).df()
        assert _canon(got) == _canon(want), how


@_SETTINGS
@given(ROWS)
def test_distinct_and_topk_parity(spark, rows):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = sdf.distinct().toPandas()
    want = con.execute("SELECT DISTINCT k, v, tag FROM t").df()
    assert _canon(got) == _canon(want)

    got_k = (sdf.orderBy(F.desc_nulls_last("v"), F.asc("k"),
                         F.asc_nulls_first("tag"))
             .limit(5).toPandas())
    want_k = con.execute(
        "SELECT * FROM t ORDER BY v DESC NULLS LAST, k ASC, "
        "tag ASC NULLS FIRST LIMIT 5").df()
    assert _canon(got_k) == _canon(want_k)


@_SETTINGS
@given(ROWS, ROWS)
def test_set_ops_parity(spark, left_rows, right_rows):
    """Multiset semantics across engines: UNION ALL / EXCEPT ALL /
    INTERSECT ALL keep duplicate counts; DISTINCT variants collapse
    them. Nulls compare as equal in set ops on both engines."""
    sdf_l, con = _frames(spark, left_rows)
    pdf_r = pd.DataFrame(right_rows, columns=["k", "v", "tag"])
    sdf_r = spark.createDataFrame(
        pdf_r.astype(object).where(pd.notnull(pdf_r), None),
        "k long, v long, tag string") if len(pdf_r) else \
        spark.createDataFrame([], "k long, v long, tag string")
    con.register("r", pdf_r)

    for got_df, sql in (
        (sdf_l.unionAll(sdf_r), "SELECT * FROM t UNION ALL SELECT * FROM r"),
        (sdf_l.exceptAll(sdf_r), "SELECT * FROM t EXCEPT ALL SELECT * FROM r"),
        (sdf_l.intersectAll(sdf_r),
         "SELECT * FROM t INTERSECT ALL SELECT * FROM r"),
        (sdf_l.union(sdf_r).distinct(),
         "SELECT * FROM t UNION SELECT * FROM r"),
        (sdf_l.intersect(sdf_r),
         "SELECT * FROM t INTERSECT SELECT * FROM r"),
    ):
        got = got_df.toPandas()
        want = con.execute(sql).df()
        assert _canon(got) == _canon(want), sql


@_SETTINGS
@given(st.lists(st.tuples(KEYS, VALS, TAGS), min_size=1, max_size=40))
def test_cube_rollup_parity(spark, rows):
    """CUBE/ROLLUP super-aggregate rows: grouping_id disambiguates a
    cube-generated NULL from a data NULL (tag is nullable here), so
    the comparison is exact even when both kinds collide.

    min_size=1: a REAL cross-engine divergence this test found — on an
    EMPTY input DuckDB emits the grand-total super-aggregate row
    (gid=3, n=0, standard GROUP BY () semantics) while Spark's cube()
    emits nothing. The registry's cube/rollup queries never aggregate
    an empty relation, so the gate is unaffected; pinned here as a
    known boundary instead of silently fuzzed around."""
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = (sdf.cube("k", "tag")
           .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"),
                F.sum("v").alias("sv"))
           .toPandas())
    want = con.execute(
        "SELECT k, tag, GROUPING(k, tag) AS gid, count(*) AS n, "
        "sum(v) AS sv FROM t GROUP BY CUBE (k, tag)").df()
    assert _canon(got) == _canon(want)

    got = (sdf.rollup("k", "tag")
           .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
           .toPandas())
    want = con.execute(
        "SELECT k, tag, GROUPING(k, tag) AS gid, count(*) AS n "
        "FROM t GROUP BY ROLLUP (k, tag)").df()
    assert _canon(got) == _canon(want)
