"""Materialize the deterministic synthetic corpus (+ the corpus-level IDF
table) to parquet ONCE, so scaling legs measure the pipeline over a stored
table — the way a cluster job reads input — instead of re-running the
generator at every parallelism level (at local[4] the generator+cache
overhead alone exceeded the 90-min leg budget at 3.2M pages).

Usage:  python BENCH/prep_corpus.py 3200000 /tmp/pfs_corpus_3200000
Then:   SPARK_GRAFT_CORPUS_DIR=/tmp/pfs_corpus_3200000 python bench.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1])
    out = sys.argv[2]
    from predicate_finder_spark.operators.extract import extract_pages
    from predicate_finder_spark.operators.mentions import explode_sentences
    from predicate_finder_spark.operators.scoring import build_idf
    from predicate_finder_spark.session import get_spark
    from predicate_finder_spark.synth import synth_corpus

    t0 = time.time()
    spark = get_spark(app_name="pfs-prep-corpus")
    t = synth_corpus(spark, n)
    for name in ("pages", "aliases", "kg_triples", "ontology", "embeddings",
                 "gold_triples"):
        t[name].write.mode("overwrite").parquet(os.path.join(out, name))
    # IDF is corpus-level state (pipeline docstring: incremental runs MUST
    # pass a fixed table), so it belongs with the corpus snapshot
    pages = spark.read.parquet(os.path.join(out, "pages"))
    build_idf(explode_sentences(extract_pages(pages))).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "idf"))
    print(f"prepared {out} ({n} pages) in {round(time.time() - t0, 1)}s")


if __name__ == "__main__":
    main()
