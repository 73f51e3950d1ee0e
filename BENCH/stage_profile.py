"""Per-stage scaling profile of the flagship pipeline — find WHERE the
wall time goes at a given parallelism, so the N vs 4N efficiency gap can be
attributed to specific stages (and driver gaps) instead of hand-waved.

For every stage the Spark UI REST API gives submission/completion wall
times plus the summed executorRunTime across its tasks.  At p cores a
perfectly parallel stage has wall ~= executorRunTime / p; a stage whose
wall stays flat when p quadruples is the scaling bottleneck.  Driver time
(planning, broadcast build, scheduling gaps between stages) shows up as
job_wall - sum(stage walls on the critical path).

Usage (one leg; run once per parallelism level, same corpus):

    SPARK_GRAFT_CPUS=4  PROFILE_PAGES=800000 python BENCH/stage_profile.py
    SPARK_GRAFT_CPUS=16 PROFILE_PAGES=800000 python BENCH/stage_profile.py

or against a pre-materialized corpus (BENCH/prep_corpus.py):

    SPARK_GRAFT_CORPUS_DIR=/tmp/pfs_corpus_800000 SPARK_GRAFT_CPUS=4 \
        python BENCH/stage_profile.py

Prints one JSON line: {"cpus", "wall_sec", "stage_wall_sum", "driver_gap",
"exec_run_total_s", "ideal_wall_s", "stages": [...top by wall...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ts(s: str) -> float:
    # REST timestamps look like 2026-08-18T01:02:03.456GMT
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("PROFILE_PAGES", "200000"))
    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR")

    from predicate_finder_spark.config import PipelineConfig
    from predicate_finder_spark.operators.extract import extract_pages
    from predicate_finder_spark.operators.mentions import explode_sentences
    from predicate_finder_spark.operators.scoring import build_idf
    from predicate_finder_spark.plans.pipeline import build_scorer_dicts, extract_triples
    from predicate_finder_spark.session import get_spark
    from predicate_finder_spark.synth import synth_corpus

    sp = int(os.environ.get("PROFILE_SHUFFLE_PARTITIONS", 2 * cpus))
    extra = {"spark.ui.enabled": "true"}
    # experiment dials (wave-quantization work): PROFILE_COALESCE=0 disables
    # AQE partition coalescing so the shuffle partition count is exact;
    # PROFILE_ADVISORY sets the AQE target partition bytes
    if os.environ.get("PROFILE_COALESCE") == "0":
        extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    if os.environ.get("PROFILE_ADVISORY"):
        extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = os.environ[
            "PROFILE_ADVISORY"
        ]
    spark = get_spark(
        app_name="pfs-stage-profile", master=f"local[{cpus}]",
        shuffle_partitions=sp,
        extra_conf=extra,
    )
    if corpus_dir:
        def _rd(name):
            return spark.read.parquet(os.path.join(corpus_dir, name))

        pages = _rd("pages")
        n_pages = pages.count()
        dicts = {k: _rd(k).cache() for k in ("aliases", "kg_triples", "ontology", "embeddings")}
        idf_df = _rd("idf").cache()
    else:
        t = synth_corpus(spark, n_pages)
        pages = t["pages"].cache()
        pages.count()
        dicts = {k: t[k].cache() for k in ("aliases", "kg_triples", "ontology", "embeddings")}
        idf_df = build_idf(explode_sentences(extract_pages(pages))).cache()
    for d in dicts.values():
        d.count()
    idf_df.count()
    scorer_dicts = build_scorer_dicts(
        idf_df, dicts["kg_triples"], dicts["ontology"], dicts["embeddings"]
    )
    cfg = PipelineConfig(kg_prededuped=True)

    action = os.environ.get("PROFILE_ACTION", "save")

    def one_run():
        t0 = time.time()
        tri = extract_triples(
            spark, pages, dicts["aliases"], dicts["kg_triples"],
            dicts["ontology"], dicts["embeddings"], cfg,
            idf=idf_df, scorer_dicts=scorer_dicts,
        )
        if action == "count":
            tri.count()  # mirror bench.py's timed action exactly
        else:
            tri.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages"
        ) as r:
            return json.load(r)

    one_run()  # warm-up: python workers, code cache, broadcasts
    seen = {s["stageId"] for s in stages()}
    wall = one_run()
    new = [
        s for s in stages()
        if s["stageId"] not in seen and s["status"] == "COMPLETE"
    ]

    rows = []
    for s in new:
        sub = _ts(s["firstTaskLaunchedTime"]) if s.get("firstTaskLaunchedTime") else _ts(s["submissionTime"])
        comp = _ts(s["completionTime"])
        run_s = s.get("executorRunTime", 0) / 1e3
        w = comp - sub
        rows.append({
            "id": s["stageId"],
            "wall_s": round(w, 2),
            "run_s": round(run_s, 2),
            # parallel occupancy: 1.0 = all p cores busy the whole stage
            "occupancy": round(run_s / (w * cpus), 3) if w > 0 else None,
            "tasks": s.get("numTasks"),
            "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
            "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "name": s.get("name", "")[:60],
        })
    rows.sort(key=lambda r: -r["wall_s"])
    stage_wall = sum(r["wall_s"] for r in rows)
    run_total = sum(r["run_s"] for r in rows)
    out = {
        "cpus": cpus,
        "pages": n_pages,
        "wall_sec": round(wall, 2),
        "stage_wall_sum": round(stage_wall, 2),
        "driver_gap_s": round(wall - stage_wall, 2),
        "exec_run_total_s": round(run_total, 2),
        "ideal_wall_s": round(run_total / cpus, 2),
        "n_stages": len(rows),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "stages": rows[: int(os.environ.get("PROFILE_TOP", "14"))],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
