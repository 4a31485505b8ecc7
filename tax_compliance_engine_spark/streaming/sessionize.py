"""Streaming sessionization: the custom stateful operator the built-in
streaming aggregates can't express.

Batch sessionization (plans/queries.events_sessions) is a lag + running-sum
window — but a window over an unbounded stream is undefined, and session
windows keyed by inactivity gaps need *custom* state transitions (extend /
close / reopen), which is exactly the ``applyInPandasWithState`` escape
hatch: Arrow-batched per-key state with event-time timeouts.

Scale design: state is one open session per user (3 longs) — O(|active
users|) across the cluster's state stores; each micro-batch shuffles only
on user_id (the same key the batch twin shuffles on) and the per-key Python
work is linear in that user's batch events.  Event-time timeout + watermark
close idle sessions and evict their state, so memory is bounded on endless
streams.

Semantics vs the batch twin: identical for in-order-within-watermark data —
a session closes when a gap > ``gap_sec`` separates consecutive events; the
session row carries (user_id, start, end, n_events) in epoch seconds.
Cross-micro-batch late arrivals inside the watermark are handled, not just
tolerated: an in-gap late event pulls the open session's START back
(s = min(s, t)), and a late event more than a gap before the open session
builds its own earlier closed session(s).  The one remaining skew (state
keeps only the open-session summary, not its events) is that an
already-emitted earlier session cannot be reopened by an even-later
arrival.  Late events *older than the watermark* are dropped by Spark
before the operator runs (the standard streaming trade).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

SESSION_GAP_SEC = 1800

_OUT_SCHEMA = (
    "user_id long, session_start_sec long, session_end_sec long, n_events long"
)
_STATE_SCHEMA = "start_sec long, end_sec long, n_events long"


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_sec: int = SESSION_GAP_SEC,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Append-mode stream of CLOSED sessions (30-min inactivity gap by
    default).  A session is emitted when a later event opens the next
    session for that user, or when the event-time timeout fires (watermark
    passed session end + gap with no new events)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def func(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user_id, s, e, n))
            state.remove()
        else:
            batches = [pdf for pdf in pdfs if len(pdf)]
            secs: list[int] = []
            for pdf in batches:
                ts = pd.to_datetime(pdf[ts_col])
                secs.extend(ts.astype("datetime64[ns]").astype("int64") // 10**9)
            secs.sort()
            if state.exists:
                s, e, n = state.get
            else:
                s = e = n = None
            # `early` buffers sessions built from late arrivals that precede
            # the OPEN session's start by more than the gap: they can never
            # merge into it, and sorted order puts them first in the batch.
            early: tuple[int, int, int] | None = None
            for t in secs:
                t = int(t)
                if s is None:
                    s, e, n = t, t, 1
                elif t < s - gap_sec:
                    if early is not None and t - early[1] <= gap_sec:
                        early = (early[0], t, early[2] + 1)
                    else:
                        if early is not None:
                            closed.append((user_id, *early))
                        early = (t, t, 1)
                elif t - e > gap_sec:
                    closed.append((user_id, s, e, n))
                    s, e, n = t, t, 1
                else:
                    # in-gap arrival — possibly late (inside the watermark)
                    # but before the open session's start: pull start back
                    # so cross-batch disorder can't skew session_start_sec
                    s, e, n = min(s, t), max(e, t), n + 1
            if early is not None:
                closed.append((user_id, *early))
            if s is not None:
                state.update((s, e, n))
                # fire once the watermark passes the gap horizon (ms epoch)
                state.setTimeoutTimestamp((e + gap_sec) * 1000)
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_sec", "session_end_sec", "n_events"],
        )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            func,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
