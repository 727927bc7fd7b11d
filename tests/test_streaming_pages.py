"""Streaming KG front: pages stream -> sentences (batch-equal) ->
watermarked incremental mention counts (batch-equal)."""

import pytest
from pyspark.sql import functions as F

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.functions import cleaning, tokenize
from llm_review_aggregation_spark.streaming import events as ev
from llm_review_aggregation_spark.streaming import pages as sp

TERMS = sorted(synth.ASPECT_TERMS)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream") / "pages")
    synth.synthesize_pages(spark, n_groups=3, docs_per_group=10).write.parquet(d)
    return d


def test_stream_sentences_equal_batch(spark, pages_dir):
    stream = sp.stream_sentences(sp.read_page_stream(spark, pages_dir))
    ev.run_append_to_memory(stream, "q_sent_stream", f"{pages_dir}_ckpt1")
    got = sorted(
        (r["url"], r["sent_id"], r["sentence"], tuple(r["tokens"]), r["warc_ts"])
        for r in spark.table("q_sent_stream").collect()
    )
    batch_pages = spark.read.parquet(pages_dir)
    batch = sorted(
        (r["url"], r["sent_id"], r["sentence"], tuple(r["tokens"]), r["warc_ts"])
        for r in tokenize.segment_sentences(
            cleaning.extract_docs(batch_pages, carry_cols=("warc_ts",)),
            carry_cols=("warc_ts",),
        ).collect()
    )
    assert got == batch and len(got) > 0


def test_streaming_mention_counts_equal_batch(spark, pages_dir):
    stream = sp.stream_sentences(sp.read_page_stream(spark, pages_dir, max_files_per_trigger=2))
    agg = sp.streaming_mention_counts(stream, TERMS, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("q_mentions")
        .outputMode("complete")
        .option("checkpointLocation", f"{pages_dir}_ckpt2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["term"]): r["n_mentions"]
        for r in spark.table("q_mentions").collect()
    }
    batch_sents = tokenize.segment_sentences(
        cleaning.extract_docs(spark.read.parquet(pages_dir), carry_cols=("warc_ts",)),
        carry_cols=("warc_ts",),
    )
    terms_arr = F.array(*[F.lit(t) for t in TERMS])
    expected = {
        (r["window_start"], r["term"]): r["n_mentions"]
        for r in (
            batch_sents.withColumn(
                "term",
                F.explode(F.filter(F.col("tokens"), lambda t: F.array_contains(terms_arr, t))),
            )
            .groupBy(F.window("warc_ts", "1 hour").alias("w"), "term")
            .agg(F.count(F.lit(1)).alias("n_mentions"))
            .select(F.col("w.start").alias("window_start"), "term", "n_mentions")
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_mention_counts_preserve_multiplicity(spark):
    """A term repeated within one sentence counts once per occurrence
    (occurrence semantics, not sentences-containing-term). withWatermark is
    a no-op on a batch frame, so the streaming expression is unit-testable
    directly."""
    sents = spark.createDataFrame(
        [("2024-01-01 00:10:00", ["lens", "lens", "body"]),
         ("2024-01-01 00:20:00", ["lens", "strap"])],
        "warc_ts string, tokens array<string>",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = {
        r["term"]: r["n_mentions"]
        for r in sp.streaming_mention_counts(sents, ["lens", "body"], window="1 hour").collect()
    }
    assert got == {"lens": 3, "body": 1}


def test_batch_callers_unaffected_by_carry(spark, pages_dir):
    pages = spark.read.parquet(pages_dir)
    plain = tokenize.segment_sentences(cleaning.extract_docs(pages))
    assert plain.columns == ["url", "group_id", "sent_id", "sentence", "tokens"]
