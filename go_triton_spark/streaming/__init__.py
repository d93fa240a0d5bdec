"""Streaming layer: the store pipeline, checkpoint stats, event-time ops."""

from go_triton_spark.streaming.store import StorePipeline
from go_triton_spark.streaming.checkpoints import checkpoint_stats

__all__ = ["StorePipeline", "checkpoint_stats"]
