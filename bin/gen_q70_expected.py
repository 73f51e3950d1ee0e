#!/usr/bin/env python
"""Generate resources/q70_expected.json: expected BPE piece stats per
document (md5(text) -> "n_pieces|md5(pieces joined by '|')") for
doc_id < 200 in every driver testdata scale factor.

Pure-python reference path (duckdb scan + operators/bpe.py kernels, no
Spark) — the driver gate then proves the distributed apply (pandas UDF,
Arrow batches, engine tokenizer) reproduces these values bit-for-bit.
Merges come from the pinned fixture (see PINNED_WORD_FREQS rationale).

Rerun after changing the tokenizer, segment_word, or the fixture:
    python bin/gen_q70_expected.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from predicate_finder_spark.functions.text import py_tokenize  # noqa: E402
from predicate_finder_spark.operators.bpe import (  # noqa: E402
    PINNED_WORD_FREQS,
    learn_bpe,
    segment_word,
)

OUT = os.path.join(
    os.path.dirname(__file__), "..", "predicate_finder_spark", "resources",
    "q70_expected.json",
)


def main() -> None:
    merges = learn_bpe(list(PINNED_WORD_FREQS), 64)
    ranks = {p: i for i, p in enumerate(merges)}
    expected: dict[str, str] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE doc_id < 200"
        ).fetchall()
        for (text,) in rows:
            pieces: list[str] = []
            for w in py_tokenize((text or "").lower()):
                pieces.extend(segment_word(w, ranks))
            key = hashlib.md5(text.encode()).hexdigest()
            val = f"{len(pieces)}|{hashlib.md5('|'.join(pieces).encode()).hexdigest()}"
            if key in expected and expected[key] != val:
                raise SystemExit(f"conflicting expectation for {key}")
            expected[key] = val
    with open(OUT, "w") as f:
        json.dump(expected, f, indent=0, sort_keys=True)
    print(f"wrote {len(expected)} expectations ({len(merges)} merges) to {OUT}")


if __name__ == "__main__":
    main()
