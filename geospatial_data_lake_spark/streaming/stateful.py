"""Custom stateful streaming operators — T2/T3 via applyInPandasWithState.

The reference's content iterator threads explicit cursor state
({first_item, next_item}) between Step Function iterations
(ref: backend/content_iterator/task.py:40-75) and its import-status view
is recomputed per request from three sources (ref:
backend/import_status/get.py:39-94). Both are *user-defined stateful
streaming* shapes: per-key state that outlives a single micro-batch.

``running_import_status`` keeps one state cell per (dataset_id,
version_id): counts of passed/failed checks seen so far and the derived
outcome. Each micro-batch of validation-result rows updates the cell and
emits the current status row — the update-mode analog of the reference's
poll-the-services GET. State is partitioned by key across executors;
eviction by processing-time timeout bounds state for abandoned versions.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATUS_SCHEMA = StructType(
    [
        StructField("dataset_id", StringType()),
        StructField("version_id", StringType()),
        StructField("n_passed", LongType()),
        StructField("n_failed", LongType()),
        StructField("outcome", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_passed", LongType()),
        StructField("n_failed", LongType()),
    ]
)


def _make_update_status(evict_ms: int | None):
    def _update_status(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """State update: fold this batch's pass/fail counts into the
        running cell, emit the refreshed status row."""
        if state.hasTimedOut:
            state.remove()
            return
        n_passed, n_failed = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_passed += int((pdf["result"] == "Passed").sum())
            n_failed += int((pdf["result"] == "Failed").sum())
        state.update((n_passed, n_failed))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        outcome = "Failed" if n_failed else "Passed"
        yield pd.DataFrame(
            {
                "dataset_id": [key[0]],
                "version_id": [key[1]],
                "n_passed": [n_passed],
                "n_failed": [n_failed],
                "outcome": [outcome],
            }
        )

    return _update_status


def running_import_status(
    validation_stream: DataFrame, evict_ms: int | None = None
) -> DataFrame:
    """Continuously-updated per-version validation status (T3) over a
    stream of validation-result rows (dataset_id, version_id, check, url,
    result).

    ``evict_ms``: processing-time state eviction for abandoned versions —
    pass a duration on 24/7 streams to bound state size. Default off:
    a processing-time timeout keeps scheduling timeout-check batches, so
    ``Trigger.AvailableNow`` drain-and-stop runs would never terminate.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if evict_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return validation_stream.groupBy("dataset_id", "version_id").applyInPandasWithState(
        _make_update_status(evict_ms),
        outputStructType=STATUS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
