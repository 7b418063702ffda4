"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (the Spark surface for operators the built-in
windowed aggregates can't express).

[EXTENDED] north-star surface — no streaming exists in the reference.

Semantics: events for a user belong to one session while inter-event gaps
stay <= 30 minutes (same rule as the batch :func:`...queries.advanced.
q_sessionize`, which is also this operator's oracle on a bounded replay).
State per user = the running session ledger (seq, bounds, count); each
micro-batch merges its (sorted) events into the ledger and emits the
updated sessions for that user.

Scale: state is keyed by user_id and lives in the state store, sharded
across executors by the groupBy shuffle; each invocation receives Arrow
batches for one key. GroupStateTimeout would evict idle users in an
unbounded deployment; the bounded replay here never times out, so every
session (open or closed) is emitted at the end of the single batch —
making the final table equal the batch answer, which is what the oracle
checks.
"""

from __future__ import annotations

import bisect
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .views_stream import _stream_conf, _stream_events

SESSION_GAP_US = 30 * 60 * 1_000_000  # exact integer microseconds

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("session_end", T.StringType()),
    ]
)

# state: flattened session ledger (parallel arrays keep the state schema simple)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),  # epoch micros
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _fmt(epoch_us: int) -> str:
    return pd.Timestamp(epoch_us, unit="us").strftime("%Y-%m-%d %H:%M:%S")


def _sessionize_user(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this batch's events into the user's session ledger and emit
    the full updated ledger (complete-per-key semantics on bounded data)."""
    starts: list[int]
    if state.exists:
        starts, ends, counts = (list(x) for x in state.get)
    else:
        starts, ends, counts = [], [], []

    ts_all = sorted(
        int(t)
        for pdf in batches
        for t in (pdf["ts"].astype("int64") // 1_000).tolist()  # ns -> us
    )
    for t in ts_all:
        # insert into the sorted ledger — events may arrive out of order
        # across micro-batches, so appending to the last session is wrong;
        # the event joins its predecessor and/or successor session when the
        # gap closes, possibly bridging the two into one
        i = bisect.bisect_right(starts, t)
        joins_prev = i > 0 and t - ends[i - 1] <= SESSION_GAP_US
        joins_next = i < len(starts) and starts[i] - t <= SESSION_GAP_US
        if joins_prev and joins_next:
            # bridges sessions i-1 and i
            ends[i - 1] = ends.pop(i)
            counts[i - 1] += counts.pop(i) + 1
            starts.pop(i)
        elif joins_prev:
            ends[i - 1] = max(ends[i - 1], t)
            counts[i - 1] += 1
        elif joins_next:
            starts[i] = min(starts[i], t)
            counts[i] += 1
        else:
            starts.insert(i, t)
            ends.insert(i, t)
            counts.insert(i, 1)

    state.update((starts, ends, counts))
    (user_id,) = key
    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(starts),
            "session_seq": list(range(1, len(starts) + 1)),
            "n_events": counts,
            "session_start": [_fmt(s) for s in starts],
            "session_end": [_fmt(e) for e in ends],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """The streaming sessionization transform.

    State merging handles out-of-order arrival across micro-batches (late
    events split/bridge ledger sessions correctly). NB: the memory sink in
    update mode *appends* each batch's re-emitted rows — a multi-batch
    deployment needs an upserting sink keyed on (user_id, session_seq);
    the bounded single-batch replay used by the test gate does not.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the bounded events replay; the
    final table equals the batch gaps-and-islands answer (the oracle)."""
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with _stream_conf(spark):
        q = (
            sessionize_stream(_stream_events(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).orderBy("user_id", "session_seq")


ORACLE_SQL = {
    # identical to the batch q_sessionize oracle — the stateful streaming
    # operator must converge to the batch answer on a bounded replay
    "stream_sessionize": """
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
            FROM gaps
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
}
