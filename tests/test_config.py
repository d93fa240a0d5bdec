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
