"""E2 — segment: docs -> sentences (+ argumentation phrases).

UDTF-style 1->N explode expressed as pandas UDF returning array<string> +
posexplode (reference T1/T2: ontology_bert/phrase_tokenizer.py:17-27,
T6: arg_framework/review.py:43-66).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from llm_review_aggregation_spark import textproc as tp


@pandas_udf(ArrayType(StringType()))
def sent_tokenize_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: [tp.filter_underscore(s) for s in tp.sent_tokenize(t or "")])


@pandas_udf(ArrayType(StringType()))
def word_tokenize_udf(sentence: pd.Series) -> pd.Series:
    return sentence.map(lambda s: tp.word_tokenize(s or ""))


def segment_sentences(docs: DataFrame) -> DataFrame:
    """docs(url, group_id, text) -> sentences(url, group_id, sent_id, sentence, tokens)."""
    sents = docs.select(
        "url",
        "group_id",
        F.posexplode(sent_tokenize_udf(F.col("text"))).alias("sent_id", "sentence"),
    )
    return sents.withColumn("tokens", word_tokenize_udf(F.col("sentence")))


def make_split_phrases_udf(max_words: float):
    @pandas_udf(ArrayType(StringType()))
    def split_phrases_udf(sentence: pd.Series) -> pd.Series:
        return sentence.map(lambda s: tp.split_phrases(s or "", max_words))

    return split_phrases_udf


def segment_phrases(sentences: DataFrame, max_words: float) -> DataFrame:
    """sentences -> phrases(url, group_id, sent_id, phrase_id, phrase, tokens).

    The reference re-tokenizes raw review bodies for argumentation
    (review.py:58-66); this engine reuses the sentence table — one upstream
    scan instead of two — and splits on the same conjunction regex.
    """
    udf = make_split_phrases_udf(max_words)
    ph = sentences.select(
        "url",
        "group_id",
        "sent_id",
        F.posexplode(udf(F.col("sentence"))).alias("phrase_pos", "phrase"),
    )
    ph = ph.withColumn(
        "phrase_id",
        F.concat_ws("#", "url", F.col("sent_id").cast("string"), F.col("phrase_pos").cast("string")),
    ).withColumn(
        "phrase_ord",
        (F.col("sent_id").cast("long") * 100000 + F.col("phrase_pos")).cast("long"),
    )
    return ph.withColumn("tokens", word_tokenize_udf(F.col("phrase")))
