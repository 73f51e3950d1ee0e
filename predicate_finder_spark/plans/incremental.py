"""Incremental KG construction: process only never-seen pages per batch.

A production crawl pipeline never reprocesses the corpus: each new crawl
snapshot is diffed against the set of already-processed URLs, only the
delta flows through extraction, and the graph is the union of all
committed batches.  This works because the flagship plan is per-page
decomposable ONCE the corpus-level state is pinned: extraction, linking
(dictionary-side disambiguation), pairing, the KG join, and scoring are
all pure functions of (page, dictionaries) — so batch boundaries cannot
change any triple.  The one non-decomposable input, IDF/embedding
state, must therefore be passed in fixed (``scorer_dicts`` from
``plans.pipeline.build_scorer_dicts`` or a materialized ``idf`` table);
this module refuses to run without it rather than silently producing
batch-dependent scores.

State layout (append-only, crash-safe — the parquet/manifest stand-in
for Iceberg snapshot appends, same rationale as sources/tables.py):

    state_dir/batches/<batch_id>/triples/   triples of this delta
    state_dir/batches/<batch_id>/urls/      urls processed by this delta
    state_dir/batches/<batch_id>/_batch.json   atomic commit marker

A batch exists iff its ``_batch.json`` marker committed (tmp + rename);
a crash mid-batch leaves no marker, the partial dirs are ignored, and
the next run reprocesses that delta — idempotent by construction, no
cleanup step.  Readers take the union of committed batches only.

Scale shape at 10^12 docs: delta detection is ONE anti-join of the
snapshot against the processed-url table (shuffle on url, AQE-handled
skew); everything downstream touches only the delta.  The seen-url side
grows monotonically but stores one short string per page — at Common
Crawl scale it is the same order as a single crawl's url list, and the
anti-join is the standard "new-crawl minus seen" step every crawler
runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from predicate_finder_spark.config import PipelineConfig
from predicate_finder_spark.plans.pipeline import extract_triples
from predicate_finder_spark.sources.tables import read_manifest, write_stage

_BATCH_MARKER = "_batch.json"


def _batches_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "batches")


def committed_batches(state_dir: str, include_replaced: bool = False) -> list[str]:
    """Batch ids with a committed marker, in commit order (ties: name).

    Batches listed in any committed marker's ``replaces`` field (written
    by :func:`compact_batches`) are hidden unless ``include_replaced`` —
    the compacted batch IS their content, Iceberg-snapshot style."""
    bd = _batches_dir(state_dir)
    if not os.path.isdir(bd):
        return []
    out, replaced = [], set()
    for name in os.listdir(bd):
        marker = os.path.join(bd, name, _BATCH_MARKER)
        try:
            with open(marker) as f:
                meta = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            continue  # torn or absent marker: batch never happened
        out.append((meta.get("committed_at", 0.0), name))
        replaced.update(meta.get("replaces", []))
    names = [name for _, name in sorted(out)]
    if include_replaced:
        return names
    return [n for n in names if n not in replaced]


def incremental_state(
    spark: SparkSession, state_dir: str, as_of: str | None = None
) -> tuple[DataFrame | None, DataFrame | None]:
    """(cumulative triples, processed urls) across committed batches, or
    (None, None) when no batch has ever committed.

    ``as_of``: time-travel read — only batches up to and including the
    named batch (in commit order) contribute, the Iceberg snapshot-as-of
    semantics.  A batch folded away by :func:`compact_batches` is no
    longer addressable (compaction trades time-travel granularity for
    file count, exactly Iceberg's snapshot expiry) — asking for one
    raises rather than silently returning the wrong state."""
    names = committed_batches(state_dir)
    if as_of is not None:
        if as_of not in names:
            raise ValueError(
                f"as_of batch {as_of!r} is not a visible committed batch "
                f"(committed: {names}) — it may have been compacted away"
            )
        names = names[: names.index(as_of) + 1]
    if not names:
        return None, None
    bd = _batches_dir(state_dir)
    triples = [spark.read.parquet(os.path.join(bd, n, "triples")) for n in names]
    urls = [spark.read.parquet(os.path.join(bd, n, "urls")) for n in names]
    t = triples[0]
    for x in triples[1:]:
        t = t.unionByName(x)
    u = urls[0]
    for x in urls[1:]:
        u = u.unionByName(x)
    return t, u


def seen_content_hashes(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Union of committed batches' content-hash tables (``hashes/`` dirs),
    or None when no committed batch carries one.  Batches committed before
    content-dedup existed (or with it off) simply contribute nothing."""
    bd = _batches_dir(state_dir)
    frames = []
    for name in committed_batches(state_dir):
        p = os.path.join(bd, name, "hashes")
        if os.path.isdir(p):
            frames.append(spark.read.parquet(p))
    if not frames:
        return None
    out = frames[0]
    for x in frames[1:]:
        out = out.unionByName(x)
    return out


def extract_triples_incremental(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    kg_triples: DataFrame,
    ontology: DataFrame,
    embeddings: DataFrame,
    state_dir: str,
    batch_id: str,
    cfg: PipelineConfig | None = None,
    idf: DataFrame | None = None,
    scorer_dicts: tuple[dict, dict] | None = None,
    dedup_content: bool = False,
) -> DataFrame:
    """Process the pages of ``pages`` not yet in ``state_dir``, commit them
    as batch ``batch_id``, and return the cumulative triples table.

    Re-running with the same ``batch_id`` after a successful commit is a
    no-op read; re-running after a crash redoes the delta (the torn batch
    was never visible).  ``pages`` may be a full snapshot (superset of
    everything seen) or a pure delta feed — the anti-join makes both
    equivalent.

    ``dedup_content=True`` additionally drops crawl mirrors: pages whose
    ``md5(text)`` already appeared in ANY committed batch (one more
    anti-join — on a 16-byte key, not documents), plus within-batch exact
    duplicates (lowest url survives, operators/dedup semantics).  Mirror
    urls still commit to the seen-url table, so they are never re-fetched
    into a later delta; the per-batch ``hashes/`` table is the growing
    corpus fingerprint set — same monotone-state shape as seen urls.
    """
    if idf is None and scorer_dicts is None:
        raise ValueError(
            "incremental runs need corpus-level scorer state pinned: pass "
            "idf= or scorer_dicts= (plans.pipeline.build_scorer_dicts); a "
            "per-batch IDF would make scores depend on batch boundaries"
        )
    cfg = cfg or PipelineConfig()
    prior_triples, seen_urls = incremental_state(spark, state_dir)
    batch_dir = os.path.join(_batches_dir(state_dir), batch_id)
    if os.path.exists(os.path.join(batch_dir, _BATCH_MARKER)):
        return prior_triples  # this batch already committed

    delta = (
        pages.join(seen_urls.select("url"), "url", "left_anti")
        if seen_urls is not None else pages
    )
    # dimension-bounded existence probe (limit 1), not a full count
    if delta.limit(1).count() == 0:
        return prior_triples if prior_triples is not None else _empty_like(spark)

    extract_input = delta
    if dedup_content:
        from predicate_finder_spark.operators.dedup import exact_dedup

        seen_h = seen_content_hashes(spark, state_dir)
        hashed = delta.withColumn("_h", F.md5("text"))
        if seen_h is not None:
            hashed = hashed.join(seen_h.select("_h"), "_h", "left_anti")
        extract_input = exact_dedup(
            hashed, id_col="url", text_col="text"
        ).drop("_h")
        if extract_input.limit(1).count() == 0:
            extract_input = None  # all mirrors; still commit urls below

    tri = (
        extract_triples(
            spark, extract_input, aliases, kg_triples, ontology, embeddings,
            cfg=cfg, idf=idf, scorer_dicts=scorer_dicts,
        )
        if extract_input is not None
        else _empty_like(spark)
    )
    ch = cfg.config_hash()
    # commit order: data tables first, marker last (tmp + rename) — the
    # batch becomes visible atomically with both tables in place
    write_stage(tri, os.path.join(batch_dir, "triples"), "inc_triples", ch)
    write_stage(
        delta.select("url").distinct(), os.path.join(batch_dir, "urls"),
        "inc_urls", ch,
    )
    if dedup_content:
        write_stage(
            delta.select(F.md5("text").alias("_h")).distinct(),
            os.path.join(batch_dir, "hashes"), "inc_hashes", ch,
        )
    marker = {
        "batch_id": batch_id,
        "config_hash": ch,
        "committed_at": time.time(),
        "triples_rows": (read_manifest(os.path.join(batch_dir, "triples")) or {}).get(
            "rows"
        ),
    }
    tmp = os.path.join(batch_dir, _BATCH_MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(batch_dir, _BATCH_MARKER))

    cum, _ = incremental_state(spark, state_dir)
    return cum


def _empty_like(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "subj string, pred string, obj string, score double, url string, "
        "provenance struct<stage:string, rule:string>",
    )


def compact_batches(
    spark: SparkSession, state_dir: str, remove_old: bool = False
) -> str | None:
    """Fold every visible committed batch into ONE compacted batch —
    the Iceberg snapshot-compaction analog for the append-only state.

    A long-running ingest accumulates thousands of small batch dirs; the
    cumulative read unions all of them every run.  Compaction rewrites
    the union (triples, urls, and content hashes where present) as a
    single batch whose marker lists the source batches in ``replaces``;
    readers hide replaced batches, so visibility flips ATOMICALLY with
    the marker rename.  Crash before the marker: the partial compact dir
    is invisible and the sources remain live — rerun-safe, no cleanup
    needed.  ``remove_old=True`` deletes the replaced dirs afterwards
    (best-effort; leaving them costs only disk — readers already ignore
    them).

    Returns the new batch id, or None when fewer than two batches exist.
    """
    names = committed_batches(state_dir)
    if len(names) < 2:
        return None
    bd = _batches_dir(state_dir)
    triples, urls = incremental_state(spark, state_dir)
    new_id = "compact-" + hashlib.md5("|".join(names).encode()).hexdigest()[:12]
    batch_dir = os.path.join(bd, new_id)
    write_stage(triples, os.path.join(batch_dir, "triples"), "inc_triples", "compact")
    write_stage(urls, os.path.join(batch_dir, "urls"), "inc_urls", "compact")
    hash_frames = [
        spark.read.parquet(os.path.join(bd, n, "hashes"))
        for n in names
        if os.path.isdir(os.path.join(bd, n, "hashes"))
    ]
    if hash_frames:
        h = hash_frames[0]
        for x in hash_frames[1:]:
            h = h.unionByName(x)
        write_stage(h.distinct(), os.path.join(batch_dir, "hashes"),
                    "inc_hashes", "compact")
    marker = {
        "batch_id": new_id,
        "committed_at": time.time(),
        "replaces": names,
        "triples_rows": (read_manifest(os.path.join(batch_dir, "triples")) or {}).get("rows"),
    }
    tmp = os.path.join(batch_dir, _BATCH_MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(batch_dir, _BATCH_MARKER))
    if remove_old:
        import shutil

        for n in names:
            shutil.rmtree(os.path.join(bd, n), ignore_errors=True)
    return new_id
