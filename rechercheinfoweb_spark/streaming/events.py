"""Streaming event analytics: watermarked windows + stateful sessions.

The reference serves queries and records latency histograms in-process
(server.go:59-60,106,184-189); the Spark-native counterpart treats
metrics/events as an unbounded stream.  Two operators:

* :func:`windowed_event_counts` — tumbling/sliding event-time window
  aggregation with a watermark for late data (the streaming twin of
  the batch ``ev_hourly`` contract query).
* :func:`sessionize_stream` — custom stateful operator via
  ``applyInPandasWithState``: per-user session tracking with a gap
  timeout, emitting closed sessions (the streaming twin of the batch
  ``ev_sessionize`` contract query).

Both are pure transformations on a streaming DataFrame — source
(files/Kafka/rate) and sink are the caller's choice, so tests drive
them with a file source + availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import (
    GroupState, GroupStateTimeout,
)
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField,
    StructType, TimestampType,
)

SESSION_GAP_SECS = 1800  # same 30-min gap as the batch contract query

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", LongType(), False),
    StructField("closed", IntegerType(), False),
])

_STATE_SCHEMA = StructType([
    StructField("start_ts", DoubleType(), True),
    StructField("last_ts", DoubleType(), True),
    StructField("n_events", LongType(), True),
])


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed counts/sums with late-data watermark.

    Output: (window_start, window_end, event_type, n, sum_value).
    In append mode a window emits once its watermark passes — the
    state store holds only open windows, so state is bounded by
    (watermark horizon / slide) x |event_type| regardless of stream
    length."""
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    # watermarks require TIMESTAMP (session tz is pinned to UTC in
    # get_spark, so an NTZ source column converts losslessly)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


def _session_fn(key, pdfs, state: GroupState):
    """Per-user session state machine (30-min inactivity gap).

    State = (start_ts, last_ts, n_events) of the open session.
    Emits one row per CLOSED session plus, on data, the current open
    session (closed=0) so downstream sees progress; a processing-time
    timeout closes idle sessions even if the user never returns."""
    import datetime as dt

    import pandas as pd

    user_id = key[0]

    def mk(start, last, n, closed):
        utc = dt.timezone.utc
        return {"user_id": user_id,
                "session_start":
                    dt.datetime.fromtimestamp(start, utc).replace(tzinfo=None),
                "session_end":
                    dt.datetime.fromtimestamp(last, utc).replace(tzinfo=None),
                "n_events": n, "closed": closed}

    out = []
    if state.hasTimedOut:
        start, last, n = state.get
        out.append(mk(start, last, n, 1))
        state.remove()
    else:
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(
                t.timestamp() for t in pd.to_datetime(pdf["ts"]))
        ts_all.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts_all:
            if last is not None and t - last > SESSION_GAP_SECS:
                out.append(mk(start, last, n, 1))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        if last is not None:
            state.update((float(start), float(last), int(n)))
            state.setTimeoutDuration(SESSION_GAP_SECS * 1000)
            out.append(mk(start, last, n, 0))
    yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization.

    State is one tiny tuple per active user; scale-out is the
    standard state-store sharding on the grouping key (user_id), so
    10^9 users spread over the cluster with no hot spot beyond the
    key distribution itself."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
