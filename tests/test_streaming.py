"""Structured Streaming ingest: streaming extraction == batch extraction."""

from __future__ import annotations

import pytest

from predicate_finder_spark.operators.extract import extract_pages
from predicate_finder_spark.streaming.ingest import (
    read_page_stream,
    run_to_memory_sink,
    streaming_extract,
    windowed_page_counts,
)


@pytest.fixture(scope="module")
def pages_path(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "pages")
    corpus["pages"].repartition(4).write.mode("overwrite").parquet(p)
    return p


def test_streaming_extraction_matches_batch(spark, corpus, pages_path):
    stream = streaming_extract(read_page_stream(spark, pages_path, max_files_per_trigger=2))
    run_to_memory_sink(stream, "stream_extract")
    got = spark.sql("SELECT url, text FROM stream_extract")
    want = (
        extract_pages(corpus["pages"].filter("lang = 'en'")).select("url", "text")
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_windowed_counts(spark, pages_path):
    agg = windowed_page_counts(read_page_stream(spark, pages_path))
    run_to_memory_sink(agg, "stream_counts")
    rows = spark.sql("SELECT * FROM stream_counts").collect()
    assert rows and all(r["n_pages"] > 0 for r in rows)
    assert {c for c in spark.table("stream_counts").columns} == {
        "window_start", "lang", "n_pages",
    }


def test_streaming_quality_gate_matches_batch(spark, corpus, pages_path):
    """The fitted quality classifier is a pure column expression, so it
    gates a STREAM with zero changes — same plan, no Python worker, no
    state.  Streamed survivors == batch survivors exactly."""
    from pyspark.sql import functions as F

    from predicate_finder_spark.operators.quality import (
        PINNED_QUALITY_WEIGHTS,
        quality_logit,
    )
    from predicate_finder_spark.streaming.ingest import read_page_stream

    z = quality_logit(F.col("text"), weights=PINNED_QUALITY_WEIGHTS)
    # gate at the batch median so the filter demonstrably KEEPS and DROPS
    # (page prose scores below the paragraph-trained 0.5 operating point;
    # a production gate would refit or recalibrate the threshold)
    thr = (
        corpus["pages"].select(z.alias("z")).agg(F.expr("percentile(z, 0.5)")).first()[0]
    )
    gated = read_page_stream(spark, pages_path).filter(z >= thr).select("url")
    run_to_memory_sink(gated, "stream_quality")
    got = spark.sql("SELECT url FROM stream_quality")
    want = corpus["pages"].filter(z >= thr).select("url")
    n_all = corpus["pages"].count()
    assert 0 < want.count() < n_all  # the gate genuinely splits
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
