"""Custom stateful streaming operator — gap-based sessionization with
``applyInPandasWithState``.

The batch sessionizer (q_sessionize) needs the whole history; a stream
cannot re-sort the past, so per-user state carries (current session start,
last event time, count) across micro-batches.  A session closes when the
gap to the next event exceeds ``gap_minutes`` OR the event-time timeout
fires (watermark passes last_ts + gap); closed sessions are emitted
downstream, open ones stay in state — bounded by the watermark, the same
state-hygiene story as the windowed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

STATE_SCHEMA = "start long, last long, n long"
OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events bigint")

GAP_MINUTES_DEFAULT = 30


def make_session_fn(gap_minutes: int = GAP_MINUTES_DEFAULT):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
        else:
            ts_us = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            # Interval gap-merge: treat each batch event as a [t, t] interval
            # plus the stored session as one [start, last] interval, sort by
            # start, merge any pair within gap.  Handles out-of-order events
            # on BOTH sides of the stored session: an event within the gap
            # merges (bounds only ever widen); an event more than gap EARLIER
            # than the session start forms its own already-closed session —
            # the same split the batch sessionizer produces.  Only the
            # latest merged interval stays in state (its timeout tracks
            # last + gap).
            intervals = [(t, t, 1) for t in sorted(ts_us)]
            if state.exists:
                intervals.append(state.get)
                intervals.sort()
            cur = None
            for s, e, cnt in intervals:
                if cur is None:
                    cur = [s, e, cnt]
                elif s - cur[1] > gap_us:
                    closed.append((user_id, cur[0], cur[1], cur[2]))
                    cur = [s, e, cnt]
                else:
                    cur[1] = max(cur[1], e)
                    cur[2] += cnt
            if cur is not None:
                state.update((cur[0], cur[1], cur[2]))
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            out = pd.DataFrame(closed, columns=["user_id", "s", "e", "n_events"])
            yield pd.DataFrame({
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["s"], unit="us"),
                "session_end": pd.to_datetime(out["e"], unit="us"),
                "n_events": out["n_events"],
            })

    return fn


def sessionize_stream(events_stream, gap_minutes: int = GAP_MINUTES_DEFAULT,
                      watermark: str = "1 hour"):
    """events stream (user_id, ts, ...) -> closed sessions stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                make_session_fn(gap_minutes),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
