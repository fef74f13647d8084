"""Custom stateful streaming operators via applyInPandasWithState.

The reference's `aggregate` processor holds per-group state in heap maps
and concludes a group when its processing-time `group_duration` elapses
(aggregate-processor/.../AggregateProcessor.java:29,82-127;
AggregateGroupManager.java:16-53), with a consistent-hash peer forward
making each group node-local. Structured Streaming's
``applyInPandasWithState`` is the exact Spark analog: the groupBy shuffle
is the peer forwarder, ``GroupState`` is the group map (fault-tolerant in
the checkpoint instead of lost on crash), and ``ProcessingTimeTimeout``
is the conclude timer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_count(
    stream: DataFrame, identification_keys: list[str], count_key: str = "n"
) -> DataFrame:
    """Per-key cumulative event count, emitted every micro-batch the key
    appears in (update-mode analog of CountAggregateAction with an
    unbounded group)."""
    keys_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in stream.select(*identification_keys).schema.fields
    )
    out_schema = f"{keys_schema}, `{count_key}` long"
    state_schema = "cnt long"

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch_n = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + batch_n
        state.update((total,))
        yield pd.DataFrame([[*key, total]], columns=[*identification_keys, count_key])

    return stream.groupBy(*identification_keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_group_count(
    stream: DataFrame,
    identification_keys: list[str],
    group_duration_ms: int,
    count_key: str = "value",
) -> DataFrame:
    """The reference's aggregate/count action verbatim: a group accumulates
    for ``group_duration`` of processing time after its first event, then
    CONCLUDES — emitting one row (keys, count) and clearing state
    (AggregateProcessor.java:82-127 semantics, crash-safe via the
    streaming checkpoint instead of in-heap maps)."""
    keys_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in stream.select(*identification_keys).schema.fields
    )
    out_schema = f"{keys_schema}, `{count_key}` long"
    state_schema = "cnt long, start_ms long"

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import time as _time

        if state.hasTimedOut:
            cnt, _ = state.get
            state.remove()
            yield pd.DataFrame([[*key, cnt]], columns=[*identification_keys, count_key])
            return
        batch_n = sum(len(p) for p in pdfs)
        now_ms = int(_time.time() * 1000)
        if state.exists:
            cnt, start_ms = state.get
        else:
            cnt, start_ms = 0, now_ms  # group clock starts at FIRST event,
            # like AggregateGroupManager.shouldConcludeGroup
        out = []
        # Spark invokes the data path (hasTimedOut=False) whenever a key
        # has new rows, so an always-active key would never see its
        # timeout; conclude here exactly like the reference — the expired
        # group emits and the new events seed a FRESH group
        if cnt > 0 and now_ms - start_ms >= group_duration_ms:
            out.append([*key, cnt])
            cnt, start_ms = 0, now_ms
        cnt += batch_n
        state.update((cnt, start_ms))
        # the timeout covers the key going quiet; re-arm with remaining
        # time (GroupState clears it on every invocation)
        state.setTimeoutDuration(max(1, group_duration_ms - (now_ms - start_ms)))
        yield pd.DataFrame(out, columns=[*identification_keys, count_key])

    return stream.groupBy(*identification_keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
    )
