"""applyInPandasWithState: custom stateful operator through the real
streaming engine, including state persistence across micro-batches."""

import json
import os

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
