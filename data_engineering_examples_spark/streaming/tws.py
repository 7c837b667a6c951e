"""Arbitrary stateful processing via Spark 4's ``transformWithState``
API (SURVEY §2.9 T3 — the modern successor to
``applyInPandasWithState``, used by ``tasks.py``).

``transformWithStateInPandas`` gives the operator-state form the old
API lacks: NAMED state variables (value/list/map) with per-variable
TTL, event-time timers, and an initial-state bootstrap — the shape
Spark recommends for new stateful pipelines.  ``UserAggProcessor``
keeps ONE fixed-size ValueState per user (running count + running
max), so state size is O(|keys|) regardless of stream length — the
bounded-state discipline every 100 TB streaming job needs.

Requires the RocksDB state store provider (the only provider that
implements the transformWithState operator contract in OSS Spark 4)
AND the ``protobuf`` package: Spark's TWS Python client speaks a
proto-serialized state protocol (``pyspark.sql.streaming.proto``).
This sandbox ships neither protobuf nor a way to install it, so the
END-TO-END drain cannot run here — the processor's aggregation logic
is unit-tested directly (``tests/test_r5_new_queries.py``) against a
stubbed state handle, and the module is wired so a protobuf-equipped
deployment can stream it unchanged (see ``user_running_agg``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# emitted once per (key, micro-batch): the post-batch running aggregate
TWS_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, max_value_millis BIGINT"


class UserAggProcessor(StatefulProcessor):
    """Running (count, max) per user across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, mx BIGINT")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, mx = (self._agg.get() or (0, None)) if self._agg.exists() else (0, None)
        for pdf in rows:
            n += len(pdf)
            batch_max = int(pdf["vm"].max()) if len(pdf) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        self._agg.update((n, mx))
        yield pd.DataFrame(
            [{"user_id": int(key[0]), "n_events": n, "max_value_millis": mx}]
        )

    def close(self) -> None:
        pass


def user_running_agg(stream):
    """events stream (user_id, vm) -> per-batch running aggregates."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserAggProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
