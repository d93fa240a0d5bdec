"""Pluggable error reporting for skipped/corrupt records and stream
failures.

The reference wires Sentry at process start (triton.go:29-32) and
reports every skipped record from the reader loop
(triton/stream_reader.go:159-192). This module is that hook surface
for the Spark engine: a *reporter* is any picklable callable

    reporter(kind: str, message: str, context: dict) -> None

invoked with kinds like ``corrupt_record`` (decode-side skip) or
``stream_error`` (streaming-query failure). The decode path calls it
EXECUTOR-side per skipped record — mirroring the reference, which
reports from the reader goroutine — so a production reporter must be
picklable: a module-level function or an instance whose state pickles
(e.g. one that calls ``sentry_sdk.capture_message``; sentry_sdk
re-initializes per worker via its own fork handlers).

Default behavior is unchanged from earlier rounds: log a warning and
count per kind (``LogReporter``). Wire a custom reporter either
globally (``set_error_reporter``) before building plans, or per call
site via the ``on_error=`` keyword on ``decode_msgpack_column`` /
``StorePipeline`` / ``TritonEngine.store``.

Executor note: the reporter object is captured into the plan's task
closure at plan-BUILD time, so ``set_error_reporter`` affects plans
built afterwards; executor-side invocations mutate the executor's
pickled copy (reporters that need cross-process aggregation should
emit to an external sink, exactly like the reference's Sentry DSN).
"""

from __future__ import annotations

import logging
from typing import Callable

_log = logging.getLogger("go_triton_spark")

Reporter = Callable[[str, str, dict], None]


class LogReporter:
    """Default reporter: warn-log and count per kind. Picklable."""

    def __init__(self) -> None:
        self.counts: dict[str, int] = {}

    def __call__(self, kind: str, message: str, context: dict) -> None:
        self.counts[kind] = self.counts.get(kind, 0) + 1
        _log.warning("triton %s: %s %s", kind, message, context)


class CollectingReporter:
    """Test helper: record every report in-process. Picklable, but
    executor-side reports land in the executor's copy — use it with
    driver-side paths or single-process (local) plans only."""

    def __init__(self) -> None:
        self.events: list[tuple[str, str, dict]] = []

    def __call__(self, kind: str, message: str, context: dict) -> None:
        self.events.append((kind, message, dict(context)))


_reporter: Reporter = LogReporter()


def set_error_reporter(reporter: Reporter | None) -> None:
    """Install the process-global reporter (None restores the default).

    Affects plans built AFTER the call; the reference's equivalent is
    the raven DSN read once at startup (triton.go:29-32).
    """
    global _reporter
    _reporter = reporter if reporter is not None else LogReporter()


def get_error_reporter() -> Reporter:
    return _reporter


def safe_report(reporter: Reporter, kind: str, message: str,
                **context) -> None:
    """Invoke a reporter, never letting reporter bugs kill the stream
    (the reference's reader likewise never aborts on a raven failure)."""
    try:
        reporter(kind, message, context)
    except Exception:
        _log.exception("error reporter raised (ignored)")
