"""Skew-salting and bucketed co-located join tests (plan-verified)."""

import os

from pyspark.sql import functions as F

from go_triton_spark.operators.skew import (detect_dominant_key,
                                            salted_join, skew_aware_join,
                                            write_bucketed)


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dim = spark.createDataFrame(
        [(i, f"user-{i}") for i in range(15)], ["user_id", "user_name"])
    plain = (ev.join(dim, "user_id")
             .groupBy("user_name").agg(F.count("*").alias("n")))
    salted = (salted_join(ev, dim, "user_id", salt_buckets=8)
              .groupBy("user_name").agg(F.count("*").alias("n")))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one key owns 90% of rows; salting must spread it across buckets
    big = spark.range(10000).select(
        F.when(F.col("id") < 9000, 7).otherwise(F.col("id") % 100)
         .alias("k").cast("long").alias("k"), F.col("id"))
    small = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    out = salted_join(big, small, "k", salt_buckets=8)
    assert out.count() == 10000


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    # (warehouse dir is a static conf; tables land in ./spark-warehouse
    # and are dropped below)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_bucketed(o.select("o_orderkey", "o_totalprice"),
                   "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "lineitem_b", "l_orderkey", n_buckets=8)
    # at test scale the planner prefers broadcast (correct!); disable it
    # to expose the co-located sort-merge path the bucketing buys at scale
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table("orders_b")
                  .join(spark.table("lineitem_b"),
                        F.col("o_orderkey") == F.col("l_orderkey")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin with NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _hot_corpus(spark, n=20000, hot_frac=0.5, hot_key=42):
    """The skew-experiment shape: one NARROW key owns half the rows —
    the case AQE's byte-based detector measurably misses
    (tools/skew_experiment.py, SCALE.md round-5)."""
    return spark.range(n).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(1000)) < int(hot_frac * 1000),
               F.lit(hot_key)).otherwise(F.pmod("id", F.lit(1000)))
         .cast("long").alias("k"),
        F.col("id").alias("v"))


def test_detect_dominant_key_hot_vs_uniform(spark):
    hot = detect_dominant_key(_hot_corpus(spark), "k")
    assert hot["key_value"] == 42
    assert 0.35 <= hot["share"] <= 0.65, hot
    uni = detect_dominant_key(
        spark.range(20000).select(F.pmod("id", F.lit(1000)).alias("k")), "k")
    assert uni["share"] <= 0.05, uni


def test_detect_dominant_key_survives_key_clustered_layout(spark):
    """Head-of-partition sampling must still see the hot key when the
    data is SORTED by the key (a key owning p of the rows owns ~p of
    the range partitions)."""
    clustered = _hot_corpus(spark).orderBy("k")
    probe = detect_dominant_key(clustered, "k")
    assert probe["key_value"] == 42
    assert probe["share"] >= 0.3, probe


def test_skew_aware_join_routes_salted_on_hot_plain_on_uniform(spark):
    """The guard engages on the experiment's 50%-key corpus and stays
    off on uniform keys (VERDICT r5 ask #4) — and never changes the
    join result either way."""
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1000)],
                                ["k", "name"])
    hot = _hot_corpus(spark)
    out_hot = skew_aware_join(hot, dim, "k")
    assert out_hot._skew_route["route"] == "salted", out_hot._skew_route
    plan = out_hot._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan  # really the salted-join plan, not a flag
    assert (sorted(map(tuple, out_hot.select("k", "v", "name").collect()))
            == sorted(map(tuple, hot.join(dim, "k").collect())))

    uni = spark.range(20000).select(
        F.pmod("id", F.lit(1000)).alias("k"), F.col("id").alias("v"))
    out_uni = skew_aware_join(uni, dim, "k")
    assert out_uni._skew_route["route"] == "plain", out_uni._skew_route
    assert "_salt" not in out_uni._jdf.queryExecution().analyzed().toString()
    assert out_uni.count() == 20000


def test_join_skew_aware_query_routes_salted_on_testdata(spark, sf_dir):
    """The gated operator really exercises the guard: the testdata
    corpus is ~44% 'en', so the probe must choose the salted route
    (visible as _salt in the analyzed plan)."""
    from go_triton_spark.operators import REGISTRY

    df = REGISTRY["join_skew_aware"].spark(spark, sf_dir)
    assert "_salt" in df._jdf.queryExecution().analyzed().toString()
    assert df.count() >= 1


def test_salted_join_equivalence_property(spark):
    """Property (hypothesis-style over seeded cases): salting never
    changes the join result — any key distribution, any salt width."""
    import random
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n_keys = rng.randint(2, 6)
        # pathological skew: ~70% of big-side rows on one hot key
        big_rows = [(0 if rng.random() < 0.7 else rng.randrange(n_keys),
                     rng.randrange(1000)) for _ in range(500)]
        small_rows = [(k, f"dim-{k}") for k in range(n_keys)]
        big = spark.createDataFrame(big_rows, ["k", "v"])
        small = spark.createDataFrame(small_rows, ["k", "name"])
        for buckets in (1, 4, 16):
            plain = sorted((r["k"], r["v"], r["name"]) for r in
                           big.join(small, "k").collect())
            salted = sorted((r["k"], r["v"], r["name"]) for r in
                            salted_join(big, small, "k", salt_buckets=buckets).collect())
            assert salted == plain, f"seed={seed} buckets={buckets}"
