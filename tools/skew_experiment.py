#!/usr/bin/env python
"""Adversarial skew-join experiment: one key owns 50% of the fact rows.

Round-4's scale batches replicate data uniformly; this one builds the
shape that actually breaks shuffle joins — a single hot key holding
half the fact table — and measures three strategies at x-multiples of
the sf0.1 events table joined against a per-user dimension:

  plain     sort-merge/shuffle join, AQE skew-split DISABLED — the
            pathological baseline: the hot key's rows land in ONE
            reducer task and the join runs at single-task speed.
  aqe       AQE skew-join ENABLED (thresholds lowered so the local
            partitions qualify; at cluster scale the defaults —
            256 MiB / 5x median — engage on real data volumes). The
            executed plan must show the skewed SMJ split
            (``skew=true``), asserted, not assumed.
  salted    operators.skew.salted_join (16 salt buckets): the big
            side scatters its hot key across 16 reducers, the dim
            side replicates 16x. The explicit path for keys so hot
            even a split partition won't fit one executor.

Usage: python tools/skew_experiment.py [--mults 10,20] [--hot 0.5]
Prints per-strategy wall seconds and whether AQE's skew split engaged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_skew"
HOT_KEY = 42


def build(spark, mult: int, hot_frac: float) -> str:
    """x-mult replica of events with ``hot_frac`` of rows forced onto
    one user_id, plus a users dimension covering every key."""
    from pyspark.sql import functions as F

    out = f"{WORK}/x{mult}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    rep = ev.crossJoin(spark.range(mult).withColumnRenamed("id", "__c"))
    rep = (rep.withColumn("event_id",
                          F.col("event_id") + F.col("__c") * F.lit(10_000_000_000))
           # deterministic hot-key assignment: hash of event_id
           .withColumn("user_id",
                       F.when(F.pmod(F.xxhash64("event_id"), F.lit(1000))
                              < int(hot_frac * 1000), F.lit(HOT_KEY))
                       .otherwise(F.pmod(F.col("user_id"), F.lit(100_000))))
           # incompressible payload (testdata's props is ~9 bytes from
           # a 10-value domain — it compresses to nothing and would
           # make even the "wide" shape invisible to byte-based skew
           # detection; real event JSON doesn't compress to zero)
           .withColumn("payload",
                       F.concat(F.md5(F.col("event_id").cast("string")),
                                F.md5(F.hex(F.col("event_id")))))
           .drop("__c"))
    rep.write.mode("overwrite").parquet(f"{out}/events.parquet")
    users = (spark.range(100_001).select(
        F.col("id").alias("user_id"),
        (F.pmod(F.col("id"), F.lit(7))).alias("segment"),
        F.concat(F.lit("user_"), F.col("id")).alias("name")))
    users.write.mode("overwrite").parquet(f"{out}/users.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> int:
    from pyspark.sql import functions as F

    from go_triton_spark.operators.skew import salted_join, skew_aware_join
    from go_triton_spark.session import get_spark

    mults = [int(x) for x in (
        sys.argv[sys.argv.index("--mults") + 1].split(",")
        if "--mults" in sys.argv else ["10", "20"])]
    hot = (float(sys.argv[sys.argv.index("--hot") + 1])
           if "--hot" in sys.argv else 0.5)

    spark = get_spark("go-triton-spark-skew")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for m in mults:
        d = build(spark, m, hot)
        ev = spark.read.parquet(f"{d}/events.parquet")
        users = spark.read.parquet(f"{d}/users.parquet")

        # Two aggregate shapes, because AQE's skew detector reads
        # POST-COMPRESSION shuffle BYTES, not row counts or join work:
        #   wide   — props/value survive pruning: the hot partition
        #            carries real bytes and the detector sees it.
        #   narrow — count(*) only: column pruning leaves just the
        #            8-byte key, and a constant hot key compresses to
        #            ~nothing (measured: 1M-row hot partition = 399 KB
        #            vs a 186 KB median — below ANY sane threshold),
        #            so AQE declares "0 skewed partitions" while one
        #            task still executes 50% of the join probes. The
        #            salted join spreads the WORK regardless of bytes.
        def agg_wide(j):
            return j.groupBy("segment").agg(
                F.count("*").alias("n"), F.sum("value").alias("v"),
                F.max("payload").alias("p"))

        def agg_narrow(j):
            return j.groupBy("segment").agg(F.count("*").alias("n"))

        def run_collect(j) -> float:
            t0 = time.time()
            j.collect()  # action on j itself so ITS adaptive plan
            return round(time.time() - t0, 2)  # finalizes (inspectable)

        res: dict = {}
        # the dimension is small enough to broadcast — which would
        # dodge the skew entirely; disable to force the shuffle join
        # shapes this experiment exists to measure (at 100 TB the dim
        # side of a skewed join is often too big to broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            for shape, agg in (("wide", agg_wide), ("narrow", agg_narrow)):
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
                res[f"{shape}_plain"] = run_collect(
                    agg(ev.join(users, "user_id")))

                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
                # local partitions are MiB-sized; scale the engage
                # thresholds down so the 50%-key partition qualifies
                # the same way a multi-GiB one does vs the 256 MiB
                # default at cluster scale
                spark.conf.set("spark.sql.adaptive.skewJoin."
                               "skewedPartitionThresholdInBytes", "4m")
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
                j = agg(ev.join(users, "user_id"))
                res[f"{shape}_aqe"] = run_collect(j)
                res[f"{shape}_aqe_split_engaged"] = "skew=true" in (
                    j._jdf.queryExecution().executedPlan().toString())

                res[f"{shape}_salted"] = run_collect(
                    agg(salted_join(ev, users, "user_id")))

                # the automatic route (round-6): probe + salt, timed
                # INCLUDING the probe cost so the guard's overhead is
                # part of its own row
                j_auto = skew_aware_join(ev, users, "user_id")
                res[f"{shape}_auto"] = run_collect(agg(j_auto))
                res[f"{shape}_auto_route"] = j_auto._skew_route["route"]
        finally:
            for k in ("spark.sql.adaptive.skewJoin.enabled",
                      "spark.sql.adaptive.skewJoin."
                      "skewedPartitionThresholdInBytes",
                      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                      "spark.sql.autoBroadcastJoinThreshold",
                      "spark.sql.adaptive.autoBroadcastJoinThreshold"):
                spark.conf.unset(k)
        results[f"x{m}"] = res
        print(f"x{m}: {res}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
