"""Heavy hitters (operators/sketch.py): Misra-Gries candidate pass +
exact verify must equal the plain groupBy answer exactly, at any
partitioning."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.operators.sketch import heavy_hitters


def _exact(df, col, num, den):
    n = df.count()
    return {
        (r["value"], r["cnt"])
        for r in df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * den >= n * num)
        .collect()
    }


def _hh(df, col, num, den):
    return {(r["value"], r["cnt"]) for r in heavy_hitters(df, col, num, den).collect()}


@pytest.fixture(scope="module")
def zipf_values(spark):
    """Zipf-ish value column: a few heavy values + a long distinct tail."""
    rng = random.Random(3)
    rows = (
        [("alpha",)] * 900 + [("beta",)] * 350 + [("gamma",)] * 120
        + [(f"tail{rng.randrange(10**9)}",) for _ in range(2000)]
    )
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "v string").persist()


def test_heavy_hitters_match_exact_groupby(spark, zipf_values):
    for num, den in ((1, 100), (1, 20), (1, 10)):
        got = _hh(zipf_values, "v", num, den)
        want = _exact(zipf_values, "v", num, den)
        assert got == want and len(want) > 0, (num, den, got, want)


def test_heavy_hitters_partition_invariant_output(spark, zipf_values):
    a = _hh(zipf_values, "v", 1, 50)
    b = _hh(zipf_values.repartition(17), "v", 1, 50)
    c = _hh(zipf_values.coalesce(1), "v", 1, 50)
    assert a == b == c == _exact(zipf_values, "v", 1, 50)


def test_heavy_hitters_exact_boundary(spark):
    """A value with count EXACTLY N*num/den must be returned."""
    rows = [("hot",)] * 10 + [(f"t{i}",) for i in range(90)]  # N=100, 10%
    df = spark.createDataFrame(rows, "v string")
    got = _hh(df, "v", 1, 10)
    assert ("hot", 10) in got
    assert got == _exact(df, "v", 1, 10)


def test_heavy_hitters_bad_threshold_raises(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="0 < num < den"):
        heavy_hitters(df, "v", 3, 2)
