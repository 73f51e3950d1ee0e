"""Custom stateful streaming operator: event sessionization via
``applyInPandasWithState``.

The batch twin is q35_sessionize (gap > ``gap_seconds`` starts a new
session); this is the arbitrary-stateful-processing formulation the task
brief names: per-key state (open session) carried across microbatches in
the state store, closed sessions emitted in append mode.

Semantics / scale notes:
- state per user is O(1) (start, last, count) — bounded regardless of
  stream length; the state store shuffles by user_id exactly once.
- closed sessions are emitted as soon as a later event proves the gap; the
  LAST session per user stays open in the state store.  Production streams
  close idle sessions with an event-time timeout + watermark; the bounded
  file-source tests drive the deterministic no-timeout path and flush via
  ``flush_open_sessions`` semantics (the open tail equals the batch run's
  final session per user — tested).
- events are processed in event-time order WITHIN a microbatch (explicit
  sort below); cross-batch disorder is the watermark's job, as in any
  Spark stateful pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.DoubleType()),
    T.StructField("session_end", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
])


def _make_fn(gap_seconds: float):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple] = []
        # applyInPandasWithState hands a group's microbatch as an ITERATOR of
        # Arrow chunks (maxRecordsPerBatch-sized); sorting per chunk would
        # process a >1-chunk key out of event-time order and split sessions
        # wrongly, so materialize the whole microbatch before the single sort.
        # Bounded: this is one key's events within ONE microbatch, not the
        # stream — the trigger interval bounds it, not stream length.
        ts_all = sorted(t for pdf in pdfs for t in pdf["ts_sec"].tolist())
        for ts in ts_all:
            if last is not None and ts - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        if last is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """events(user_id, ts timestamp, ...) stream -> closed sessions stream.

    One stateful shuffle on user_id; per-key state is a 3-field struct.
    """
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts_sec"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_sessions(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Batch twin (q35 logic) emitting full session rows — the oracle for
    the streaming operator in tests."""
    from pyspark.sql import Window

    ts = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy(ts.asc())
    gap = ts - F.lag(ts).over(w)
    sess = (
        events.withColumn("__new", F.when(gap > gap_seconds, 1).otherwise(0))
        .withColumn("__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy(F.col("user_id").cast("long").alias("user_id"), "__sid")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sid")
    )
