"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time or stateful processing at all (SURVEY
section 2.2); this module supplies the Structured Streaming pattern
for operators the built-ins can't express: arbitrary per-key state
with timeouts, Arrow-batched.

``running_user_totals`` is the canonical shape: per-user cumulative
event count + value total, emitting one updated row per key per
micro-batch. State is a 2-number tuple per key — at 100 TB keys shard
across executors and state lives in the state store (RocksDB in prod
conf), checkpointed with the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _update_user_totals(key, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a streaming DataFrame.

    ``events`` must be a streaming DF with (user_id, value); emits the
    updated cumulative row for each user seen in the micro-batch.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x StatefulProcessor API)
# ---------------------------------------------------------------------

try:  # Spark >= 4.0 only; keep the module importable elsewhere
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotalsProcessor(StatefulProcessor):
        """ValueState version of ``running_user_totals`` on the
        StatefulProcessor API: explicit typed state handles, timer
        support, and RocksDB-backed state (the 100 TB path — state
        lives off-heap per executor and checkpoints incrementally).
        Requires ``spark.sql.streaming.stateStore.providerClass`` =
        RocksDBStateStoreProvider, and ``google.protobuf`` in the
        Python env (the TWS JVM<->Python state protocol); environments
        without it use ``running_user_totals`` instead."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [total]})

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """``running_user_totals`` through transformWithStateInPandas."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
except ImportError:  # pragma: no cover
    RunningTotalsProcessor = None

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError("transformWithStateInPandas needs Spark >= 4.0")
