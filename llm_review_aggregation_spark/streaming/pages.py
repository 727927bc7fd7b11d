"""Structured-Streaming front for the KG pipeline: continuously-arriving
crawl pages -> cleaned docs -> sentences -> incremental mention counts.

The reference is batch-only; this is the engine-forward path for a live
crawl feed (the north-star's Common-Crawl-style table, arriving as files).
The batch E1/E2 kernels are reused verbatim — `cleaning.extract_docs` and
`tokenize.segment_sentences` are mapInPandas transforms, which Structured
Streaming executes incrementally per micro-batch, so the streaming front
shares one code path (and therefore one behavior contract) with the batch
pipeline.

What runs incrementally:
- E1/E2 (stateless row transforms): each micro-batch of new pages becomes
  cleaned docs and exploded sentences; append-mode sink.
- candidate-mention counting (the A1 front of E3/E4): a watermarked
  aggregation over event time (warc_ts), so late-crawled pages update
  their window until the watermark passes — the incremental analog of
  count_noun_terms for a FIXED candidate dictionary. Full phrase-vocab
  discovery (a corpus-global two-pass aggregate) is intentionally batch:
  its pass-2 scoring depends on pass-1 global counts, which has no
  bounded-state streaming form; run it periodically over the accumulated
  corpus instead (the lambda-architecture split the reference's batch
  design implies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_review_aggregation_spark.functions import cleaning, tokenize

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_page_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_sentences(pages: DataFrame) -> DataFrame:
    """pages stream -> sentences stream, reusing the batch E1/E2 kernels
    unchanged (stateless transforms run per micro-batch). warc_ts rides
    through both kernels as a carry column — a post-hoc re-join on url
    would be a stateful stream-stream join."""
    docs = cleaning.extract_docs(pages, carry_cols=("warc_ts",))
    return tokenize.segment_sentences(docs, carry_cols=("warc_ts",))


def streaming_mention_counts(
    sentences: DataFrame,
    candidate_terms: list[str],
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Incremental A1-front: per event-time window, how often each candidate
    term is mentioned. Counts preserve per-sentence multiplicity (a term
    appearing twice in one sentence counts twice), matching the batch
    count_noun_terms occurrence semantics — array_intersect would collapse
    to sentences-containing-term. Candidate dictionary is broadcast-small
    (top-k), matching the batch miners' closure-broadcast discipline; state
    is bounded by (windows in watermark) x |candidates|."""
    terms = F.array(*[F.lit(t) for t in candidate_terms])
    mentions = sentences.withColumn(
        "term", F.explode(F.filter(F.col("tokens"), lambda t: F.array_contains(terms, t)))
    )
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(F.col("w.start").alias("window_start"), "term", "n_mentions")
    )
