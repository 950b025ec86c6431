"""Custom stateful streaming operator via ``applyInPandasWithState``.

``F.session_window``/``F.window`` cover the declarative cases; this is
the escape hatch for state machines Spark has no built-in for. The
example operator keeps per-user running totals across micro-batches and
emits an updated row per user per batch — the shape of a live
feature-store updater.

State is partitioned by the grouping key, so it scales horizontally: each
executor holds only its keys' state, checkpointed per batch. The pandas
flavor is Arrow-batched — the Python cost is per-group-per-batch, not
per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, batches bigint"
STATE_SCHEMA = "n bigint, s double, b bigint"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, b = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    b += 1
    state.update((n, s, b))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 6)], "batches": [b]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user cumulative (n_events, sum_value) maintained in GroupState
    across micro-batches. Input needs (user_id, value) columns."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ------------------------- transformWithState (Spark 4.x modern API)


class UserTotalsProcessor(StatefulProcessor):
    """The same per-user running-totals state machine on the modern
    ``transformWithStateInPandas`` API (Spark 4.x): schema'd named state
    (``getValueState``) instead of a single opaque tuple, explicit
    lifecycle (init/handleInputRows/close), RocksDB-backed state store,
    and room for timers/TTL the old API lacks. Output is identical to
    :func:`running_user_totals` — asserted batch-for-batch in tests, so
    either implementation can serve the contract."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, s, b = self._state.get() if self._state.exists() else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        b += 1
        self._state.update((n, s, b))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [round(s, 6)],
                "batches": [b],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """Modern-API twin of :func:`running_user_totals`. Requires the
    RocksDB state store provider (set per-session before starting the
    query; transformWithState does not support the default HDFS-backed
    provider)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
