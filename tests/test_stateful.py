"""applyInPandasWithState: custom stateful operator through the real
streaming engine, including state persistence across micro-batches."""

import json
import os

import pytest

from go_triton_spark.streaming.stateful import running_user_totals
from go_triton_spark.types import EVENTS_SCHEMA


def _write(dirpath, records, name):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _rec(eid, uid, value):
    return {"event_id": eid, "ts": "2024-01-01T00:00:00Z", "user_id": uid,
            "event_type": "click", "value": value, "props": "{}"}


def test_stateful_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(src, [_rec(1, 1, 1.0), _rec(2, 1, 2.0), _rec(3, 2, 5.0)], "b0.json")

    def run_once(qname):
        captured = []

        def sink(batch_df, batch_id):
            captured.extend(batch_df.collect())

        stream = spark.readStream.format("json").schema(EVENTS_SCHEMA).load(src)
        q = (running_user_totals(stream.select("user_id", "value"))
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["user_id"]: (r["n_events"], r["total_value"]) for r in captured}

    first = run_once("state_run1")
    assert first == {1: (2, 3.0), 2: (1, 5.0)}

    # second batch arrives; restart with same checkpoint -> state resumes
    _write(src, [_rec(4, 1, 10.0)], "b1.json")
    second = run_once("state_run2")
    assert second[1] == (3, 13.0)  # cumulative across batches, not 1


def test_transform_with_state_running_totals(spark, tmp_path):
    """Same operator on the Spark 4 StatefulProcessor API (typed
    ValueState + RocksDB state store), state resuming across restarts.
    The TWS state protocol speaks protobuf between JVM and the Python
    driver worker; skip where google.protobuf isn't installed
    (applyInPandasWithState above is the dependency-free path)."""
    pytest.importorskip("google.protobuf")
    from go_triton_spark.streaming.stateful import running_user_totals_tws

    src = str(tmp_path / "src_tws")
    ckpt = str(tmp_path / "ckpt_tws")
    _write(src, [_rec(1, 1, 1.0), _rec(2, 1, 2.0), _rec(3, 2, 5.0)], "b0.json")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        def run_once():
            captured = []

            def sink(batch_df, batch_id):
                captured.extend(batch_df.collect())

            stream = spark.readStream.format("json").schema(EVENTS_SCHEMA).load(src)
            q = (running_user_totals_tws(stream.select("user_id", "value"))
                 .writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("update").trigger(availableNow=True).start())
            q.awaitTermination(120)
            return {r["user_id"]: (r["n_events"], r["total_value"]) for r in captured}

        first = run_once()
        assert first == {1: (2, 3.0), 2: (1, 5.0)}
        _write(src, [_rec(4, 1, 10.0)], "b1.json")
        second = run_once()
        assert second[1] == (3, 13.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
