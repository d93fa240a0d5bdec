"""Error-reporter hook (reference: Sentry init triton.go:29-32; per-skip
reporting stream_reader.go:159-192). The decode path reports each
skipped record EXECUTOR-side, so these tests use a file-backed reporter
— executor Python workers are separate processes even on local[n]."""

import json
import os

import pytest
from pyspark.sql import types as T

from go_triton_spark.reporting import (CollectingReporter, LogReporter,
                                       safe_report, set_error_reporter)


def file_reporter(path):
    """Reporter that appends JSON lines — visible across the executor
    worker process boundary. A closure, so cloudpickle ships it by
    value (a test-module class would pickle by reference and fail to
    import on workers)."""

    def report(kind, message, context):
        with open(path, "a") as f:
            f.write(json.dumps({"kind": kind, "message": message,
                                "context": context}) + "\n")

    return report


def _payloads_df(spark):
    from go_triton_spark.codec.msgpack_codec import packb

    return spark.createDataFrame(
        [(packb({"event_id": 1}),),
         (b"\xc1garbage",),          # corrupt -> skipped + reported
         (packb([1, 2, 3]),),        # non-map -> skipped + reported
         (packb({"event_id": 2}),)],
        T.StructType([T.StructField("data", T.BinaryType())]))


SCHEMA = T.StructType([T.StructField("event_id", T.LongType())])


def test_decode_reports_each_skipped_record(spark, tmp_path):
    from go_triton_spark.codec.decode import decode_msgpack_column

    log = str(tmp_path / "reports.jsonl")
    out = decode_msgpack_column(
        _payloads_df(spark), SCHEMA, on_error=file_reporter(log),
        context={"stream": "events", "client": "t"})
    assert sorted(r[0] for r in out.collect()) == [1, 2]
    events = [json.loads(l) for l in open(log)]
    assert len(events) == 2
    assert all(e["kind"] == "corrupt_record" for e in events)
    assert all(e["context"] == {"stream": "events", "client": "t"}
               for e in events)
    kinds = sorted(e["message"].split(":")[0] for e in events)
    assert kinds == ["msgpack decode failed", "non-map record"]


def test_global_reporter_is_the_default_hook(spark, tmp_path):
    """set_error_reporter wires every plan built afterwards (the
    reference reads its Sentry DSN once at startup)."""
    from go_triton_spark.codec.decode import decode_msgpack_column

    log = str(tmp_path / "global.jsonl")
    set_error_reporter(file_reporter(log))
    try:
        out = decode_msgpack_column(_payloads_df(spark), SCHEMA)
        assert out.count() == 2
    finally:
        set_error_reporter(None)
    assert len(open(log).readlines()) == 2


def test_store_pipeline_reports_query_failure():
    """Driver-side: a failed streaming query surfaces as stream_error."""
    from go_triton_spark.config import StreamConfig
    from go_triton_spark.streaming.store import StorePipeline

    rep = CollectingReporter()
    pipe = StorePipeline.__new__(StorePipeline)
    pipe.cfg = StreamConfig(stream_name="events", partition_key="k")
    pipe.client = "t"
    pipe.on_error = rep

    class _FailedQuery:
        def exception(self):
            return RuntimeError("boom")

        def stop(self):
            pass

        def awaitTermination(self, *a):
            return True

    pipe.query = _FailedQuery()
    pipe.stop()
    assert rep.events and rep.events[0][0] == "stream_error"
    assert "boom" in rep.events[0][1]
    assert rep.events[0][2] == {"stream": "events", "client": "t"}


def test_log_reporter_counts_and_safe_report_never_raises():
    rep = LogReporter()
    safe_report(rep, "corrupt_record", "x", stream="s")
    safe_report(rep, "corrupt_record", "y", stream="s")
    safe_report(rep, "stream_error", "z")
    assert rep.counts == {"corrupt_record": 2, "stream_error": 1}

    def bad_reporter(kind, message, context):
        raise RuntimeError("reporter bug")

    safe_report(bad_reporter, "corrupt_record", "must not propagate")
