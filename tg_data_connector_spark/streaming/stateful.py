"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming constructs at all (SURVEY §2.7) — these are the
Spark-native capabilities a continuous CDC tail needs beyond foreachBatch:
per-key state that outlives a micro-batch, closed by event-time watermarks.

``sessionize_stream`` is the streaming twin of the batch ``sessionize`` gate
query (gap-based sessions): per-key session state lives in the state store,
sessions CLOSE when the event-time watermark passes their end + gap, and only
closed sessions are emitted (append semantics). The per-batch work is
vectorized — numpy over the whole group's micro-batch — never per-row Python.

At scale: state is partitioned by the grouping key across executors (RocksDB
state store in production conf); the watermark bounds state size — every open
session older than the watermark either extends or times out and is evicted.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, n_events bigint"
)
STATE_SCHEMA = "start bigint, end bigint, n bigint"


def _session_func(gap_sec: int):
    import numpy as np

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed end+gap with no new events: the session is
            # definitively closed — emit and evict
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, start, end, n]],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            return
        ts = np.sort(
            np.concatenate([p["epoch"].to_numpy(dtype=np.int64) for p in pdfs])
        )
        if len(ts) == 0:
            return
        if state.exists:
            start, end, n = state.get
        else:
            start = end = n = 0
        closed = []
        for t in ts:  # few events per key per micro-batch; plain-int loop
            t = int(t)
            if n == 0:
                start = end = t
                n = 1
            elif t > end + gap_sec:
                closed.append([user_id, start, end, n])
                start = end = t
                n = 1
            elif t < start - gap_sec:
                # late event older than the open session's reach: its own
                # (already-closed) singleton session
                closed.append([user_id, t, t, 1])
            else:
                start, end, n = min(start, t), max(end, t), n + 1
        state.update((start, end, n))
        # close the open session only when the watermark says no earlier
        # event can still arrive
        wm = state.getCurrentWatermarkMs() // 1000
        if wm and end + gap_sec < wm:
            closed.append([user_id, start, end, n])
            state.remove()
        else:
            state.setTimeoutTimestamp((end + gap_sec) * 1000 + 1)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def sessionize_stream(events, ts_col: str = "ts", gap_sec: int = 1800,
                      watermark: str = "30 minutes"):
    """events: streaming DataFrame with (user_id, ts timestamp). Returns the
    closed-session stream (user_id, session_start, session_end, n_events),
    epochs in seconds."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = (
        events.withWatermark(ts_col, watermark)
        .select(
            "user_id",
            F.col(ts_col),
            F.col(ts_col).cast("long").alias("epoch"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_sec),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
