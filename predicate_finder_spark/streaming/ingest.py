"""Incremental ingest: new page snapshots -> streaming extraction -> sink.

The reference is batch-only (SURVEY.md §2.10); this is the incremental
analog the north_star sketches: ``readStream`` on the pages table ->
watermarked event-time windows -> the same stateless extraction UDFs ->
``foreachBatch`` append.  Every pipeline operator is per-document or a join
against static dictionaries, so streaming needs no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from predicate_finder_spark import schemas
from predicate_finder_spark.operators.extract import extract_text


def read_page_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a pages parquet directory (stand-in for a
    Kafka/WARC feed; same downstream plan)."""
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_extract(pages_stream: DataFrame, languages: tuple[str, ...] = ("en",)) -> DataFrame:
    """Stateless streaming extraction: lang filter + pandas-UDF extraction —
    identical semantics to the batch stage (same pure function, so batch
    and streaming outputs are byte-identical per url)."""
    return (
        pages_stream.filter(F.col("lang").isin(*languages))
        .select("url", "warc_ts", extract_text("html").alias("text"), "lang")
    )


def windowed_page_counts(
    pages_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked tumbling-window ingest metrics: pages per (window, lang).
    Late data beyond the watermark is dropped (state bounded)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )


def streaming_triples(
    spark: SparkSession,
    pages_path: str,
    aliases: DataFrame,
    kg_triples: DataFrame,
    ontology: DataFrame,
    embeddings: DataFrame,
    out_path: str,
    cfg=None,
    max_files_per_trigger: int = 4,
    checkpoint_dir: str | None = None,
) -> None:
    """Incremental triple extraction: stream page files -> per-microbatch
    run the SAME batch operators -> append to a parquet triples sink.

    foreachBatch gives exactly-once-per-batch semantics against the file
    source's checkpointed offsets; because every operator is a pure
    function of its batch plus static dictionaries, the union of streamed
    batches equals the batch run over the whole corpus (tested).

    ``checkpoint_dir`` persists source offsets: a later invocation with the
    same checkpoint processes only files added since — the incremental
    resume path.  Without it every invocation reprocesses (and re-appends)
    the whole directory.
    """
    from predicate_finder_spark.operators.extract import extract_pages
    from predicate_finder_spark.operators.mentions import explode_sentences
    from predicate_finder_spark.operators.scoring import build_idf
    from predicate_finder_spark.plans.pipeline import extract_triples

    # IDF is corpus-level state: build it ONCE from the static snapshot and
    # hold it fixed across microbatches (per-batch IDF would drift scores)
    idf = build_idf(explode_sentences(extract_pages(spark.read.parquet(pages_path)))).cache()
    idf.count()

    stream = read_page_stream(spark, pages_path, max_files_per_trigger)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        tri = extract_triples(
            spark, batch_df, aliases, kg_triples, ontology, embeddings, cfg, idf=idf
        )
        tri.write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.awaitTermination()
    finally:
        q.stop()


def run_to_memory_sink(stream_df: DataFrame, name: str) -> None:
    """Drive a (bounded file-source) stream to completion into a memory
    sink — the synchronous smoke path for tests."""
    q = (
        stream_df.writeStream.outputMode(
            "append" if "n_pages" not in stream_df.columns else "complete"
        )
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
