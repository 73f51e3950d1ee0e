"""As-of join and range join semantics (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from predicate_finder_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05T00:00:00")),
         (2, 10, _ts("2024-01-01T00:00:00")),   # before any right row
         (3, 10, _ts("2024-01-03T00:00:00")),   # exactly at a right row
         (4, 99, _ts("2024-01-05T00:00:00"))],  # key with no right rows
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-02T00:00:00"), 100),
         (10, _ts("2024-01-03T00:00:00"), 200),
         (10, _ts("2024-01-03T00:00:00"), 201),   # tie on time -> max key wins
         (10, _ts("2024-01-04T00:00:00"), 300)],
        "user_id long, odate timestamp, okey long",
    )
    out = asof_join(left, right, key="user_id", left_time="ts",
                    right_time="odate", right_cols=["okey"], tie_col="okey")
    got = {r["event_id"]: r["okey"] for r in out.collect()}
    assert got == {1: 300, 2: None, 3: 201, 4: None}


def test_asof_deterministic_across_partitions(spark):
    left = spark.range(500).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(1700000000 + F.col("id") * 13).alias("t"),
    )
    right = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(1700000000 + F.col("id") * 59).alias("rt"),
        F.col("id").alias("rid"),
    )
    a = asof_join(left, right, "k", "t", "rt", ["rid"], tie_col="rid")
    b = asof_join(left.repartition(13), right.repartition(3), "k", "t", "rt", ["rid"], tie_col="rid")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_range_join(spark):
    fact = spark.createDataFrame(
        [(1, 5.0), (2, 150.0), (3, 250.0), (4, 99.99)], "id long, v double"
    )
    iv = spark.createDataFrame(
        [("a", 0.0, 100.0), ("b", 100.0, 200.0), ("ab", 0.0, 200.0)],
        "band string, lo double, hi double",
    )
    out = range_join(fact, iv, value_col="v", bucket_width=50.0)
    got = {(r["id"], r["band"]) for r in out.collect()}
    # row 3 (250.0) overlaps no interval; boundaries: lo inclusive, hi exclusive
    assert got == {(1, "a"), (4, "a"), (2, "b"), (1, "ab"), (4, "ab"), (2, "ab")}


def test_range_join_clamps_open_intervals(spark):
    from predicate_finder_spark.operators.temporal import bucketize_intervals

    fact = spark.createDataFrame([(1, 5.0), (2, 95.0)], "id long, v double")
    iv = spark.createDataFrame(
        [("open", 0.0, 1e9), ("out", 2e9, 3e9)], "band string, lo double, hi double"
    )
    out = range_join(fact, iv, value_col="v", bucket_width=10.0)
    got = {(r["id"], r["band"]) for r in out.collect()}
    assert got == {(1, "open"), (2, "open")}
    # bucket duplication is bounded by the observed value range, not the
    # interval's hi=1e9 (which would explode into 10^8 bucket rows)
    n_buckets = bucketize_intervals(iv, "lo", "hi", 10.0, bounds=(5.0, 95.0)).count()
    assert n_buckets == 10  # 'open' clips to buckets 0..9; 'out' to none


def test_range_join_no_nested_loop(spark):
    fact = spark.range(100).select(F.col("id"), (F.col("id") * 10.0).alias("v"))
    iv = spark.createDataFrame([("x", 0.0, 500.0)], "band string, lo double, hi double")
    plan = range_join(fact, iv, "v", bucket_width=100.0)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "NestedLoop" not in plan  # the whole point: equi-join, not theta
