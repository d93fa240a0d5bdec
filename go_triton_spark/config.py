"""Stream configuration: YAML logical-name -> physical stream indirection.

Mirrors the reference's config semantics (triton/config.go:11-43):

    my_stream:
      name: my_stream_v2
      partition_key: value
      region: us-west-1

- ``load_config`` parses the whole YAML into {logical_name: StreamConfig}.
- ``config_for_name`` raises KeyError for an unknown stream, matching the
  reference's missing-stream error (triton/config.go:37-41,
  config_test.go:42-54).

The config is driver-side only: it parameterizes source/sink options
(which table/path/stream to read, which column is the partition key).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml


@dataclass(frozen=True)
class StreamConfig:
    """One stream's physical config (triton/config.go:11-19)."""

    stream_name: str            # physical stream name ("name" in YAML)
    partition_key: str          # record field used as the shard partition key
    region: str = ""            # AWS region (informational in local mode)
    options: dict = field(default_factory=dict)  # extra source/sink options


def load_config(path_or_yaml: str) -> dict[str, StreamConfig]:
    """Parse stream config from a YAML file path or a YAML string."""
    if os.path.exists(path_or_yaml):
        with open(path_or_yaml, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f)
    else:
        raw = yaml.safe_load(path_or_yaml)
    if raw is None:
        return {}
    if not isinstance(raw, dict):
        raise ValueError("stream config must be a mapping of stream name -> settings")
    out: dict[str, StreamConfig] = {}
    for logical, settings in raw.items():
        if not isinstance(settings, dict):
            raise ValueError(f"stream {logical!r}: settings must be a mapping")
        known = {"name", "partition_key", "region"}
        out[logical] = StreamConfig(
            stream_name=settings.get("name", logical),
            partition_key=settings.get("partition_key", ""),
            region=settings.get("region", ""),
            options={k: v for k, v in settings.items() if k not in known},
        )
    return out


def config_for_name(configs: dict[str, StreamConfig], name: str) -> StreamConfig:
    """Lookup; unknown stream name is an error (triton/config.go:37-41)."""
    try:
        return configs[name]
    except KeyError:
        raise KeyError(f"Failed to find stream: {name}") from None
