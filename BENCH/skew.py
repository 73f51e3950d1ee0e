"""Skew-handling evidence: salted vs plain shuffle join on a Zipf-head key.

Builds a probe frame where ~90% of rows carry ONE hot key (the worst case a
Zipfian entity distribution produces at 10^12 docs), joins it against a
dictionary with AQE skew-join disabled (to isolate our salting from Spark's
backstop), and times plain vs salted.  Appends results to BENCH/BASELINE.md.

    python BENCH/skew.py
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from predicate_finder_spark.operators.joins import salted_join
    from predicate_finder_spark.session import get_spark

    spark = get_spark(
        app_name="pfs-skew",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            # isolate OUR salting from AQE's skew backstop
            "spark.sql.adaptive.skewJoin.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    n = 2_000_000
    hot_frac = 0.9
    probe = (
        spark.range(n)
        .withColumn(
            "k",
            F.when(F.rand(7) < hot_frac, F.lit("HOT")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 1000).cast("string"))
            ),
        )
        .withColumn("payload", F.md5(F.col("id").cast("string")))
        .persist()
    )
    probe.count()
    # many-to-many like the real kg_triples join: ~20 dictionary rows per
    # key, so the hot key's output amplification lands on one reducer
    dim = (
        spark.range(1001 * 20)
        .select(
            F.when(F.col("id") % 1001 == 0, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), ((F.col("id") % 1001) - 1).cast("string")))
            .alias("k"),
            (F.col("id") * 10).alias("v"),
        )
        .persist()
    )
    dim.count()
    # force a shuffle join (no broadcast) so per-reducer key balance matters
    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    for k, v in no_bcast.items():
        spark.conf.set(k, v)

    def timed(df) -> float:
        # aggregate after the join so the skewed reducer's output rows are
        # actually processed, not just emitted
        t0 = time.time()
        df.select(F.md5(F.concat("payload", F.col("v").cast("string"))).alias("h")).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.time() - t0, 2)

    results = {}
    for name, fn in (
        ("plain_shuffle_join", lambda: probe.join(dim, "k")),
        ("salted_join_16", lambda: salted_join(probe, dim, ["k"], buckets=16, salt_source="payload")),
    ):
        # best of 2 (sandbox noise)
        results[name] = min(timed(fn()), timed(fn()))
    results["speedup"] = round(results["plain_shuffle_join"] / results["salted_join_16"], 2)
    results["rows"] = n
    results["hot_fraction"] = hot_frac
    print(json.dumps(results))

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"""
## Skew-join evidence (BENCH/skew.py)

{n:,} probe rows, {int(hot_frac*100)}% on one hot key, AQE skew-join and
broadcast disabled to isolate the technique (at real scale AQE stays ON as
the backstop — this measures our explicit salting):

| join | wall (best-of-2) |
|---|---|
| plain shuffle join | {results['plain_shuffle_join']} s |
| salted join (16 buckets) | {results['salted_join_16']} s |
| **speedup** | **{results['speedup']}x** |
"""
        )


if __name__ == "__main__":
    main()
