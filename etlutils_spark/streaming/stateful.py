"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming state at all (SURVEY §2.7); this is the
pure-extension tier: arbitrary per-key state machines over an unbounded
stream, with watermark-driven timeout/eviction. The example operator —
per-user running counters — is the shape of production stateful jobs
(session carts, feature accumulators, rate limiters).

Scale: state lives in the state store partitioned by the grouping key;
one shuffle on user_id per micro-batch; watermarks bound state size.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value sum, updated per micro-batch,
    emitted as an update row each time the user appears in a batch."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    events: DataFrame,
    gap: str = "10 minutes",
    event_time_col: str = "ts",
) -> DataFrame:
    """Watermark-evicted session builder: per-user sessions closed by a
    ``gap`` of event-time inactivity, emitted only when the watermark
    passes the session's timeout — the canonical bounded-state pattern.

    State per user is one open session (start/end millis + count). Each
    batch extends or rolls the session and re-arms an EventTimeTimeout
    at ``session_end + gap``; when the watermark (driven by
    ``withWatermark(event_time_col, gap)``) crosses that, the timed-out
    callback emits the finished session and ``state.remove()`` frees the
    store — state size is bounded by the number of users active inside
    one watermark horizon, not by stream history. Sessions still open at
    the horizon never emit (standard append-mode semantics).

    A session that rolls within one batch (gap exceeded between two
    events of the same batch) is emitted immediately; only the open
    tail session waits for the watermark.

    Late-event semantics (Spark delivers below-watermark rows to
    arbitrary stateful operators; handling them is the operator's
    job): admitted events older than the open session's start by more
    than the gap accumulate into ONE pending late-session chain —
    merged while within gap of each other, folded into the open
    session when a subsequent event bridges both, and emitted as a
    single closed session otherwise (not one singleton per event). If
    a batch delivers only late stragglers for a user whose open
    session's horizon the watermark has already passed, that session
    is emitted and freed in the same batch — re-arming its timeout is
    illegal then (Spark forbids a timeout at/below the watermark) and
    no timeout callback would ever fire for it.
    """
    gap_us = _duration_ms(gap) * 1000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key

        # state carries epoch MICROseconds so emitted session bounds are
        # bit-identical to the (microsecond) source timestamps
        def session_row(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield session_row(start_us, end_us, n)
            return

        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = -1
            n = 0
        # accumulate ACROSS chunks before sorting: a group larger than
        # the Arrow batch size arrives as multiple pdfs with no
        # cross-chunk time order, so per-chunk sorting mis-sessionizes
        # big groups (an earlier chunk-2 timestamp would extend the
        # newest session or spuriously roll one — review catch)
        all_ts: list[int] = []
        for pdf in pdfs:
            # values.astype handles both ns- and us-unit pandas datetimes
            all_ts.extend(
                pd.to_datetime(pdf[event_time_col])
                .values.astype("datetime64[us]")
                .astype("int64")
                .tolist()
            )
        # pending chain of admitted-late events older than the open
        # session's start by more than the gap: two such events within
        # gap of each other are ONE session, not N singletons (review
        # catch — the old per-event yield split them)
        late: tuple[int, int, int] | None = None
        for t in sorted(all_ts):
            t = int(t)
            if n == 0:
                start_us, end_us, n = t, t, 1
            elif t < start_us - gap_us:
                # admitted-late event (>= watermark) from BEFORE the
                # open session by more than the gap: it can never merge
                # with the OPEN session directly, but consecutive late
                # events merge with each other — accumulate, emit a
                # chain only when the next late event breaks it
                if late is None:
                    late = (t, t, 1)
                elif t - late[1] <= gap_us:
                    late = (late[0], t, late[2] + 1)
                else:
                    yield session_row(*late)
                    late = (t, t, 1)
            elif t - end_us <= gap_us:
                # t is within gap of the open session; if it is ALSO
                # within gap of the pending late chain it bridges the
                # two into one continuous session — fold the chain in
                # instead of emitting it as a spurious separate session
                if late is not None and t - late[1] <= gap_us:
                    start_us = min(start_us, late[0])
                    n += late[2]
                    late = None
                # a late-but-admitted event may precede the open
                # session's start: the session's earliest event defines
                # session_start, so min() it (review catch — end-only
                # tracking emitted a start later than its first event)
                start_us = min(start_us, t)
                end_us, n = max(end_us, t), n + 1
            else:  # gap exceeded inside the batch: close + roll
                # no bridge check needed: here t > end_us + gap_us >=
                # start_us + gap_us while the chain ends below
                # start_us - gap_us, so t is > 2*gap from the chain
                yield session_row(start_us, end_us, n)
                start_us, end_us, n = t, t, 1
        if late is not None:
            # an unbridged chain ends below start_us - gap_us, so no
            # remaining in-batch event can merge with it — emit at
            # batch end. (The one-session state schema cannot carry it
            # across batches; a later batch's admitted-late neighbor
            # would start a new chain, same bound as the old per-event
            # emit but without the within-batch splits.)
            yield session_row(*late)
        # the state-store timeout clock is millisecond-granular; round UP
        # so the timeout never fires before gap_us has fully elapsed
        timeout_ms = -((-(end_us + gap_us)) // 1000)
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed this session's horizon while
            # the batch delivered only late stragglers for it (e.g.
            # another user's events drove the watermark far ahead):
            # re-arming would throw INVALID_TIMEOUT_TIMESTAMP — Spark
            # forbids a timeout at/below the watermark — and a group
            # that received data this batch gets no timeout callback,
            # so the session would otherwise wedge the stream (the old
            # unconditional re-arm crashed the query here). The session
            # is watermark-closed: emit and free its state now.
            state.remove()
            yield session_row(start_us, end_us, n)
        else:
            state.update((start_us, end_us, n))
            state.setTimeoutTimestamp(timeout_ms)

    return (
        events.withWatermark(event_time_col, gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, session_start timestamp, "
                "session_end timestamp, n_events bigint"
            ),
            # field names say what the values ARE (epoch microseconds) —
            # a debugger reading a checkpoint as millis would be 1000x
            # off (review catch)
            stateStructType="start_us bigint, end_us bigint, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(s: str) -> int:
    """Parse a duration string to milliseconds. Accepts the interval
    forms Spark's ``withWatermark`` accepts for the same string —
    abbreviated units ('10 min', '30 sec', '2 hr'), milliseconds, and
    fractional quantities ('1.5 hours') — since both consumers read
    the SAME gap argument; accepting only full unit names here while
    withWatermark accepts the rest crashed valid gaps at query
    construction (review catch)."""
    qty, unit = s.split()
    per = {
        "millisecond": 1, "milli": 1, "ms": 1,
        "second": 1_000, "sec": 1_000, "s": 1_000,
        "minute": 60_000, "min": 60_000, "m": 60_000,
        "hour": 3_600_000, "hr": 3_600_000, "h": 3_600_000,
        "day": 86_400_000, "d": 86_400_000,
    }
    key = unit.lower()
    if key not in per:
        key = key.rstrip("s")
    if key not in per:
        raise ValueError(f"unrecognized duration unit in {s!r}")
    return int(float(qty) * per[key])
