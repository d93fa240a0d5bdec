"""Skew-salting and bucketed co-located join tests (plan-verified)."""

import os

from pyspark.sql import functions as F

from go_triton_spark.operators.skew import salted_join, write_bucketed


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
