"""Stateful streaming sessionization (applyInPandasWithState) vs batch twin."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from predicate_finder_spark.streaming.sessions import batch_sessions, sessionize_stream


def _rows(chunk: int):
    base = dt.datetime(2024, 1, 1)
    out = []
    for u in range(5):
        t0 = base + dt.timedelta(seconds=u * 37)
        if chunk == 1:
            out += [(u, t0), (u, t0 + dt.timedelta(seconds=600))]
        else:
            out += [(u, t0 + dt.timedelta(seconds=2600)),
                    (u, t0 + dt.timedelta(seconds=3200))]
    return out


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = "user_id long, ts timestamp"
    spark.createDataFrame(_rows(1), schema).coalesce(1).write.parquet(src)
    time.sleep(1.5)  # distinct mtimes: the file source replays oldest-first
    spark.createDataFrame(_rows(2), schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = sessionize_stream(stream, gap_seconds=1800.0)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("closed_sessions").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("closed_sessions").collect()
    }

    # batch twin: every session except each user's open tail must be emitted
    allsess = batch_sessions(spark.read.parquet(src), 1800.0)
    w = Window.partitionBy("user_id")
    closed = allsess.withColumn("__mx", F.max("session_start").over(w)).filter(
        F.col("session_start") < F.col("__mx")
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got == want and len(got) == 5  # one closed session per user
    # the gap inside each chunk (600 s) never splits; the 2000 s gap does
    assert all(n == 2 for (_, _, _, n) in got)
