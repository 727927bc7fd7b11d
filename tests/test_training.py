"""Training-set construction (distributed, torch-free) + fit gating."""

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.functions import cleaning, tokenize, training


@pytest.fixture(scope="module")
def sentences(spark):
    pages = synth.synthesize_pages(spark, n_groups=3, docs_per_group=12)
    return tokenize.segment_sentences(cleaning.extract_docs(pages)).cache()


def test_entity_training_set_labels_and_ratio(spark, sentences):
    candidates = sorted(synth.ASPECT_TERMS) + ["thing", "stuff"]
    out = training.build_entity_training_set(
        sentences, candidates, positive_terms=frozenset(synth.ASPECT_TERMS), negative_ratio=1.0
    )
    rows = out.collect()
    assert rows, "miner produced no instances"
    n_pos = sum(1 for r in rows if r["label"] == 1)
    n_neg = sum(1 for r in rows if r["label"] == 0)
    assert n_pos > 0
    # all positives kept; negatives down-sampled to <= ~ratio (hash sample
    # is binomial around the target, bound loosely)
    assert n_neg <= 2 * max(n_pos, 1) + 5
    for r in rows:
        assert (r["entity"] in synth.ASPECT_TERMS) == (r["label"] == 1)
        assert r["masked_tokens"][r["entity_idx"]] == "[MASK]"


def test_training_set_deterministic(spark, sentences):
    candidates = sorted(synth.ASPECT_TERMS)
    a = training.build_entity_training_set(sentences, candidates, frozenset(synth.ASPECT_TERMS))
    b = training.build_entity_training_set(sentences, candidates, frozenset(synth.ASPECT_TERMS))
    ka = sorted((r["url"], r["sent_id"], r["entity"], r["label"]) for r in a.collect())
    kb = sorted((r["url"], r["sent_id"], r["entity"], r["label"]) for r in b.collect())
    assert ka == kb


def test_train_val_split_partitions_by_url(spark, sentences):
    df = sentences.select("url", "sent_id")
    train, val = training.train_val_split(df, val_frac=0.3)
    urls_t = {r["url"] for r in train.collect()}
    urls_v = {r["url"] for r in val.collect()}
    assert urls_t.isdisjoint(urls_v)
    assert train.count() + val.count() == df.count()


def test_fit_is_torch_gated():
    import pandas as pd

    with pytest.raises(NotImplementedError, match="torch"):
        training.fit_entity_head(pd.DataFrame(), "/tmp/never.pt")
