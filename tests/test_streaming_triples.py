"""Incremental ingest: streamed triple extraction == batch extraction;
rerank scorer strategy end-to-end."""

from __future__ import annotations

from predicate_finder_spark.config import PipelineConfig
from predicate_finder_spark.operators.evaluate import precision_recall
from predicate_finder_spark.plans.pipeline import extract_triples
from predicate_finder_spark.streaming.ingest import streaming_triples
from predicate_finder_spark.synth import synth_corpus


def test_streaming_triples_equal_batch(spark, tmp_path):
    t = synth_corpus(spark, 60)
    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "triples_stream")
    t["pages"].repartition(4).write.parquet(pages_path)

    streaming_triples(
        spark, pages_path, t["aliases"], t["kg_triples"], t["ontology"],
        t["embeddings"], out_path, max_files_per_trigger=2,
    )
    streamed = spark.read.parquet(out_path).select("url", "subj", "pred", "obj")
    batch = extract_triples(
        spark, spark.read.parquet(pages_path), t["aliases"], t["kg_triples"],
        t["ontology"], t["embeddings"],
    ).select("url", "subj", "pred", "obj")
    a = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_rerank_scorer_strategy(spark):
    t = synth_corpus(spark, 80)
    cfg = PipelineConfig(scorer="rerank")
    tri = extract_triples(
        spark, t["pages"], t["aliases"], t["kg_triples"], t["ontology"],
        t["embeddings"], cfg,
    )
    pr = precision_recall(tri, t["gold_triples"])
    # the linear-fallback reranker weights matcher score + overlap heaviest,
    # so the argmax is preserved on the template corpus
    assert pr["precision"] >= 0.9 and pr["recall"] >= 0.9, pr


def test_streaming_structured_channel_equals_batch(spark, tmp_path):
    """The structured channels are stateless column expressions, so they
    stream as-is: readStream -> structured_triples -> parquet sink equals
    the batch run exactly (no watermark/state needed)."""
    from predicate_finder_spark.operators.structured import structured_triples
    from predicate_finder_spark.streaming.ingest import read_page_stream
    from predicate_finder_spark.synth import synth_corpus

    t = synth_corpus(spark, 60)
    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "structured_stream")
    cp = str(tmp_path / "cp")
    t["pages"].repartition(4).write.parquet(pages_path)

    stream = read_page_stream(spark, pages_path, max_files_per_trigger=2)
    q = (
        structured_triples(stream, t["aliases"], t["ontology"])
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        tuple(r) for r in spark.read.parquet(out_path)
        .select("url", "subj", "pred", "obj").collect()
    }
    batch = {
        tuple(r) for r in structured_triples(
            spark.read.parquet(pages_path), t["aliases"], t["ontology"]
        ).select("url", "subj", "pred", "obj").collect()
    }
    assert streamed == batch and len(streamed) > 0
