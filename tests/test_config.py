"""Config tests mirroring triton/config_test.go."""

import pytest

from go_triton_spark.config import config_for_name, load_config

YAML = """\
my_stream:
  name: my_stream_v2
  partition_key: value
  region: us-west-1
"""


def test_parse_golden():
    cfgs = load_config(YAML)
    c = config_for_name(cfgs, "my_stream")
    assert c.stream_name == "my_stream_v2"
    assert c.partition_key == "value"
    assert c.region == "us-west-1"


def test_missing_stream_errors():
    cfgs = load_config(YAML)
    with pytest.raises(KeyError):
        config_for_name(cfgs, "unknown_stream")


def test_defaults_and_options():
    cfgs = load_config("s:\n  partition_key: k\n  source: file\n  path: /tmp/x\n")
    c = config_for_name(cfgs, "s")
    assert c.stream_name == "s"  # name defaults to logical name
    assert c.options == {"source": "file", "path": "/tmp/x"}


def test_empty_config():
    assert load_config("") == {}


def test_infer_schema_from_records():
    """Schema inference for unknown streams (SURVEY §1.2/§1.3): the
    tritond representative record (client_test.go:21-29) infers to the
    declared DELIVERY_EVENT_SCHEMA shape; null placeholders upgrade to
    the first concrete type seen."""
    import datetime as dt

    from pyspark.sql import types as T

    from go_triton_spark.types import infer_schema_from_records

    recs = [
        {"object_type": None, "version": 1},  # null first -> placeholder
        {"object_type": "delivery", "delivery_uuid": "abc-123",
         "ts": dt.datetime(2026, 8, 13, tzinfo=dt.timezone.utc),
         "version": 3, "data": {"couriers": ["a", "b"]}},
    ]
    schema = infer_schema_from_records(recs)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["object_type"] == T.StringType()
    assert by_name["version"] == T.LongType()
    assert by_name["ts"] == T.TimestampType()
    assert by_name["data"] == T.StructType([
        T.StructField("couriers", T.ArrayType(T.StringType()), True)])
    # every inferred type round-trips through a real DataFrame
    assert sorted(by_name) == ["data", "delivery_uuid", "object_type",
                               "ts", "version"]


def test_infer_schema_skips_non_dict_and_binary():
    from pyspark.sql import types as T

    from go_triton_spark.types import infer_schema_from_records

    schema = infer_schema_from_records(
        ["junk", {"payload": b"\x01\x02", "n": 1.5}])
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name == {"payload": T.BinaryType(), "n": T.DoubleType()}
