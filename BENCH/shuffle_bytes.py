"""Measure total shuffle bytes written by the flagship pipeline — the
experiment behind the round-4 byte-shrinking work (VERDICT-r3 item 2).

Runs extract_triples on N synthetic pages (default 100k), forces it with a
noop sink, then sums shuffle read/write and input bytes over all completed
stages via the Spark UI REST API.  Prints one JSON line; append to
BENCH/history.jsonl by hand or compare across git revisions:

    SHUFFLE_PAGES=100000 python BENCH/shuffle_bytes.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_pages = int(os.environ.get("SHUFFLE_PAGES", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from predicate_finder_spark.operators.evaluate import precision_recall
    from predicate_finder_spark.plans.pipeline import extract_triples
    from predicate_finder_spark.session import get_spark
    from predicate_finder_spark.synth import synth_corpus

    spark = get_spark(
        app_name="pfs-shuffle-bytes", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "true"},  # REST API is the meter
    )
    t = synth_corpus(spark, n_pages)
    pages = t["pages"].cache()
    pages.count()
    dicts = {k: t[k].cache() for k in ("aliases", "kg_triples", "ontology", "embeddings")}
    for d in dicts.values():
        d.count()
    # corpus-level dictionaries OUTSIDE the metered window, mirroring the
    # scaling legs (bench.py with SPARK_GRAFT_CORPUS_DIR)
    from predicate_finder_spark.operators.extract import extract_pages
    from predicate_finder_spark.operators.mentions import explode_sentences
    from predicate_finder_spark.operators.scoring import build_idf
    from predicate_finder_spark.config import PipelineConfig
    from predicate_finder_spark.plans.pipeline import build_scorer_dicts

    idf_df = build_idf(explode_sentences(extract_pages(pages))).cache()
    idf_df.count()
    scorer_dicts = build_scorer_dicts(
        idf_df, dicts["kg_triples"], dicts["ontology"], dicts["embeddings"]
    )

    # mark a stage boundary: only stages submitted after this are counted
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.load(r)

    # pass 1: cold, metered for bytes; pass 2: wall only (best-of-2 damps
    # this host's external load bursts — same norm as bench.py)
    seen = {s["stageId"] for s in stages()}
    load0 = os.getloadavg()[0]

    t0 = time.time()
    tri = extract_triples(
        spark, pages, dicts["aliases"], dicts["kg_triples"],
        dicts["ontology"], dicts["embeddings"], PipelineConfig(kg_prededuped=True),
        idf=idf_df, scorer_dicts=scorer_dicts,
    )
    tri = tri.cache()
    n_triples = tri.count()
    dt = time.time() - t0
    # snapshot BEFORE the P/R eval so its join stages don't pollute the sum
    new = [s for s in stages() if s["stageId"] not in seen
           and s["status"] == "COMPLETE"]
    pr = precision_recall(tri, t["gold_triples"])
    tri.unpersist()

    t0 = time.time()
    extract_triples(
        spark, pages, dicts["aliases"], dicts["kg_triples"],
        dicts["ontology"], dicts["embeddings"], PipelineConfig(kg_prededuped=True),
        idf=idf_df, scorer_dicts=scorer_dicts,
    ).write.mode("overwrite").format("noop").save()
    dt = min(dt, time.time() - t0)
    out = {
        "metric": "pipeline_shuffle_bytes",
        "pages": n_pages,
        "cpus": cpus,
        "wall_sec": round(dt, 2),
        "triples": n_triples,
        "precision": round(pr["precision"], 4),
        "recall": round(pr["recall"], 4),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "n_stages": len(new),
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
    }
    if os.environ.get("SHUFFLE_DETAIL"):
        det = sorted(new, key=lambda s: -s.get("shuffleWriteBytes", 0))[:10]
        out["stages"] = [
            {"id": s["stageId"], "write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
             "name": s.get("name", "")[:70]}
            for s in det
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
