"""Msgpack payload-column decode: binary records -> schema columns.

The real-AWS Kinesis source (sources/kinesis_boto3.py) surfaces raw
record payloads as a ``data`` binary column — exactly what the
reference's reader hands to msgpack decode (triton/stream_reader.go:173).
This stage is that decode as an Arrow-batched ``mapInPandas``: each
payload is one msgpack map; corrupt or non-map payloads are skipped
(S5 semantics, stream_reader.go:174-194), trailing bytes ignored.
Used by StorePipeline whenever the source emits a binary ``data``
column and a record schema is declared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from go_triton_spark.codec.msgpack_codec import MsgpackError, unpackb


def _coerce(v, dt: T.DataType):
    import datetime as _dt
    import json as _json
    if v is None:
        return None
    if isinstance(dt, T.StringType) and isinstance(v, (dict, list)):
        # msgpack maps/arrays destined for a string column surface as
        # JSON (the reference's `cat` JSON projection convention)
        return _json.dumps(v, sort_keys=True, default=str)
    if isinstance(dt, T.TimestampType) and isinstance(v, str):
        return _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
    if isinstance(dt, (T.LongType, T.IntegerType)) and not isinstance(v, bool):
        try:
            return int(v)
        except (TypeError, ValueError):
            return None
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None
    return v


def decode_msgpack_column(df: DataFrame, schema: T.StructType,
                          data_col: str = "data",
                          on_corrupt: str = "skip",
                          on_error=None,
                          context: dict | None = None) -> DataFrame:
    """Decode a binary msgpack-map column into ``schema`` columns.

    ``on_corrupt``: "skip" (reference semantics — drop, report, keep
    going) or "raise". One payload = one record map; payloads that
    decode to non-maps are treated as corrupt.

    ``on_error``: reporter invoked per skipped record, executor-side
    (the reference reports each skip to Sentry from the reader loop,
    stream_reader.go:159-192). Defaults to the process-global reporter
    (log + count). ``context`` is merged into every report.
    """
    import pandas as pd

    from go_triton_spark.reporting import get_error_reporter, safe_report

    fields = schema.fields
    names = [f.name for f in fields]
    reporter = on_error if on_error is not None else get_error_reporter()
    ctx = dict(context or {})

    def batches(it):
        for pdf in it:
            rows = []
            for raw in pdf[data_col]:
                try:
                    obj, _ = unpackb(bytes(raw))
                except (MsgpackError, TypeError) as e:
                    if on_corrupt == "skip":
                        safe_report(reporter, "corrupt_record",
                                    f"msgpack decode failed: {e}", **ctx)
                        continue
                    raise
                if not isinstance(obj, dict):
                    if on_corrupt == "skip":
                        safe_report(reporter, "corrupt_record",
                                    f"non-map record: {type(obj).__name__}",
                                    **ctx)
                        continue
                    raise MsgpackError(f"non-map record: {type(obj)}")
                rows.append(obj)
            yield pd.DataFrame(
                {f.name: pd.Series(
                    [_coerce(r.get(f.name), f.dataType) for r in rows],
                    dtype="object")
                 for f in fields},
                columns=names)

    return df.mapInPandas(batches, schema=schema)
