"""Heavy hitters with EXACT output via per-partition Misra-Gries candidates.

The 100 TB problem: "which values appear in >= 1/q of all rows" over a
column with billions of distinct values.  A plain groupBy shuffles every
distinct value; this operator shuffles (almost) nothing:

pass 1 (narrow, Arrow-batched, NO shuffle): each partition runs a
  Misra-Gries summary (Misra & Gries 1982, public) with k = q counters.
  MG guarantees every item with LOCAL frequency > 1/(k+1) of the
  partition survives its summary, and any globally (num/q)-heavy item is
  at least that frequent in SOME partition (averaging argument) — so the
  union of summaries is a SUPERSET of the true heavy hitters, at most
  k rows per partition.
pass 2 (dimension-bounded): exact counts of the candidates only — one
  broadcast semi-join + partial-agg groupBy over candidate rows — then
  the integer threshold filter ``cnt * den >= N * num`` (no float
  boundary, so the output is EXACTLY the >= num/den set and the q80
  DuckDB oracle is a plain GROUP BY ... HAVING).

The approximation lives only in the candidate set size, never in the
answer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(k: int, col: str):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    # decrement-all by the largest amount that keeps the
                    # MG invariant: min(batch count, current minimum)
                    dec = min(c, min(counters.values()))
                    c -= dec
                    counters = {
                        key: cnt - dec for key, cnt in counters.items()
                        if cnt > dec
                    }
                    if c > 0 and len(counters) < k:
                        counters[v] = c
        yield pd.DataFrame({col: list(counters.keys())})

    return summarize


def heavy_hitters(
    df: DataFrame, col: str, num: int = 1, den: int = 100
) -> DataFrame:
    """``(value, cnt)`` for every value of ``col`` with
    ``cnt >= N * num / den`` (N = total rows) — exact, via the two-pass
    plan in the module docstring.  The threshold is a RATIONAL (num/den),
    compared in integers, so there is no float boundary to disagree on.
    """
    if not (0 < num < den):
        raise ValueError("heavy_hitters: need 0 < num < den")
    k = (den + num - 1) // num  # counters per partition: ceil(den/num)
    src = df.select(F.col(col).alias(col))
    cands = (
        src.mapInPandas(
            _misra_gries_partition(k, col), schema=f"{col} {df.schema[col].dataType.simpleString()}"
        )
        .distinct()
    )
    n_total = src.count()
    counted = (
        src.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.filter(
        F.col("cnt") * F.lit(den) >= F.lit(n_total) * F.lit(num)
    ).select(F.col(col).alias("value"), "cnt")
