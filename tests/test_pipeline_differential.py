"""Differential test: Spark dataflow vs the independent loop-based oracle
(llm_review_aggregation_spark/oracle/pipeline_oracle.py) on the deterministic synthetic corpus,
stage by stage, plus the P/R gate against the planted ground truth."""

import pandas as pd
import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.functions import scoring
from llm_review_aggregation_spark.plans.pipeline import run_pipeline

from llm_review_aggregation_spark.oracle import pipeline_oracle as oracle

CFG = PipelineConfig(root_name="camera")
N_GROUPS, DOCS = 4, 18


@pytest.fixture(scope="module")
def spark_result(spark):
    pages = synth.synthesize_pages(spark, n_groups=N_GROUPS, docs_per_group=DOCS)
    return run_pipeline(spark, pages, CFG)


@pytest.fixture(scope="module")
def oracle_result():
    pages_pdf = synth.synthesize_pages_pdf(n_groups=N_GROUPS, docs_per_group=DOCS)
    ent, rel, sent = scoring.make_scorers(CFG.scorer, CFG.scorer_params)
    docs = oracle.docs_from_pages(pages_pdf)
    sentences = oracle.sentences_from_docs(docs)
    pairs = oracle.phrase_vocab(sentences, CFG.phrase_min_count, CFG.phrase_threshold)
    cand = oracle.candidates(sentences, pairs, CFG.n_candidate_aspects)
    asp = oracle.aspects(sentences, cand, ent, CFG.entity_prob_threshold)
    aspect_counts = {t: c for t, (c, _p) in asp.items()}
    synset_counts, synset_map = oracle.synsets(sentences, aspect_counts, CFG.root_name, CFG)
    concepts_list = list(synset_counts)
    sums, _cnts = oracle.meronym_scores(sentences, concepts_list, synset_map, rel)
    edges = oracle.ontology_edges(concepts_list, synset_counts, sums, CFG.root_name)
    tree_nodes = set(edges) | set(edges.values()) | {CFG.root_name}
    glossary = {n: synset_map.get(n, [n]) for n in tree_nodes}
    args = oracle.arguments(
        sentences, docs, edges, CFG.root_name, glossary, sent,
        CFG.sentiment_threshold, CFG.phrase_max_words,
    )
    return {
        "docs": docs,
        "sentences": sentences,
        "pairs": pairs,
        "candidates": cand,
        "aspects": asp,
        "synset_counts": synset_counts,
        "synsets": synset_map,
        "edges": edges,
        "arguments": args,
    }


def test_docs_byte_identical(spark_result, oracle_result):
    got = {r["url"]: r["text"] for r in spark_result.docs.collect()}
    want = {d["url"]: d["text"] for d in oracle_result["docs"]}
    assert got == want


def test_sentences_identical(spark_result, oracle_result):
    got = {(r["url"], r["sent_id"]): r["sentence"] for r in spark_result.sentences.collect()}
    want = {(s["url"], s["sent_id"]): s["sentence"] for s in oracle_result["sentences"]}
    assert got == want


def test_candidates_identical(spark_result, oracle_result):
    got = {(r["term"], r["count"]) for r in spark_result.candidates.collect()}
    want = set(oracle_result["candidates"].items())
    assert got == want


def test_aspects_identical(spark_result, oracle_result):
    got = {r["term"]: (r["count"], round(r["prob"], 9)) for r in spark_result.aspects.collect()}
    want = {t: (c, round(p, 9)) for t, (c, p) in oracle_result["aspects"].items()}
    assert got == want


def test_synsets_identical(spark_result, oracle_result):
    got = {}
    for r in spark_result.synsets.collect():
        got.setdefault(r["concept"], set()).add(r["member"])
    want = {c: set(ms) for c, ms in oracle_result["synsets"].items()}
    assert got == want


def test_ontology_edges_identical(spark_result, oracle_result):
    got = {(r["subj"], r["obj"]) for r in spark_result.ontology_edges.collect()}
    want = set(oracle_result["edges"].items())
    assert got == want


def test_triple_precision_recall_vs_planted(spark_result):
    canon = {s: c for c, ss in synth.SYNONYMS.items() for s in ss}
    planted = set(synth.MERONYMS.items())
    got = {
        (canon.get(r["subj"], r["subj"]), canon.get(r["obj"], r["obj"]))
        for r in spark_result.ontology_edges.collect()
    }
    tp_ = len(got & planted)
    precision = tp_ / max(len(got), 1)
    recall = tp_ / len(planted)
    assert precision >= 0.95 and recall >= 0.95, (sorted(got), sorted(planted))


def test_kg_triples_pr_scale_guard(spark, monkeypatch):
    """The P/R query replays the corpus through the driver-side oracle and
    must refuse beyond gate scale instead of silently toPandas-ing it."""
    import __spark_entry__ as entrymod

    monkeypatch.setattr(
        entrymod.synth, "pages_from_documents", lambda s, d: s.range(10_001)
    )
    with pytest.raises(ValueError, match="gate-scale"):
        entrymod._q_kg_triples_pr(spark, "ignored")


def test_arguments_match_oracle(spark_result, oracle_result):
    got = (
        spark_result.arguments.toPandas()
        .sort_values(["group_id", "aspect"])
        .reset_index(drop=True)
    )
    want = oracle_result["arguments"].sort_values(["group_id", "aspect"]).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["group_id", "aspect", "polarity"]:
        assert got[col].tolist() == want[col].tolist(), col
    assert (got["strength"] - want["strength"]).abs().max() < 1e-9
    for col in [
        "strongest_support_phrase",
        "strongest_attack_phrase",
        "strongest_support_feature",
        "strongest_attack_feature",
    ]:
        g = got[col].where(pd.notna(got[col]), None).tolist()
        w = want[col].where(pd.notna(want[col]), None).tolist()
        assert g == w, (col, [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b][:5])
