"""msgpack <-> Spark type mapping (SURVEY section 1.2).

The reference's effective type system is "whatever msgpack carries"
(triton/stream_reader.go:173 decodes map[string]interface{}). We map:

    bool          -> BooleanType
    int/uint      -> LongType
    float32/64    -> FloatType/DoubleType (we unify to DoubleType)
    str           -> StringType
    bin           -> BinaryType
    array         -> ArrayType(inferred)
    map           -> MapType(String, inferred) or StructType when declared
    nil           -> null
    timestamp ext -> TimestampType

Schema regime: per-stream *declared* StructType (schema-on-read) is the
default; ``infer_schema_from_records`` is the escape hatch for unknown
streams, mirroring the reference's schemaless mode.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T


def spark_type_for_value(v) -> T.DataType:
    """Best-effort Spark type for one decoded msgpack value."""
    if v is None:
        return T.StringType()  # null-only column: nullable string fallback
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, _dt.datetime):
        return T.TimestampType()
    if isinstance(v, (list, tuple)):
        elem = spark_type_for_value(v[0]) if v else T.StringType()
        return T.ArrayType(elem)
    if isinstance(v, dict):
        fields = [T.StructField(str(k), spark_type_for_value(val), True)
                  for k, val in v.items()]
        return T.StructType(fields)
    raise TypeError(f"unmappable msgpack value type: {type(v)}")


def infer_schema_from_records(records: list[dict]) -> T.StructType:
    """Union-infer a StructType from decoded record maps.

    Later records win on type conflicts except null never overrides a
    concrete type (mirrors permissive decode: corrupt/missing -> null).
    """
    fields: dict[str, T.DataType] = {}
    for rec in records:
        if not isinstance(rec, dict):
            continue
        for k, v in rec.items():
            t = spark_type_for_value(v)
            prev = fields.get(k)
            if prev is None or (isinstance(prev, T.StringType) and v is not None):
                fields[str(k)] = t
    return T.StructType([T.StructField(k, t, True) for k, t in sorted(fields.items())])


#: Production-shaped nested event record (tritond/client_test.go:21-29).
DELIVERY_EVENT_SCHEMA = T.StructType([
    T.StructField("object_type", T.StringType(), True),
    T.StructField("delivery_uuid", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("version", T.LongType(), True),
    T.StructField("data", T.StructType([
        T.StructField("couriers", T.ArrayType(T.StringType()), True),
    ]), True),
])

#: Driver `events` table schema (TESTDATA.md).
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])
