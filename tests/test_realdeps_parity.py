"""Real-stack parity harness (@realdeps): certifies the engine against the
reference's ACTUAL dependency stack — NLTK punkt/treebank/pos_tag
tokenization (reference src/ontology/ontology_bert/phrase_tokenizer.py:17-27,
helpers.py:160-202) and the three trained BERT heads
(aspects/entity_bert_net.py, relations/rel_bert_net.py,
argumentation/sentiment/tdbertnet.py) loaded through the reference-prefix
checkpoint path (bert_scorers._load accepts bert_base./fc. names).

This sandbox has neither torch nor NLTK model data, so every test here
SKIPS cleanly in CI; on a box with the real stack, run:

    REALDEPS_ENTITY_WEIGHTS=/path/bert_entity_extractor.pt \
    REALDEPS_RELATION_WEIGHTS=/path/bert_relation_extractor.pt \
    REALDEPS_SENTIMENT_WEIGHTS=/path/td_bert_sentiment.pt \
    python -m pytest tests/test_realdeps_parity.py -m realdeps

The gate: E1-E7 end-to-end on the deterministic fixture corpus with the
real tokenizer + real heads must recover the planted meronym ground truth
at P/R >= 0.95 (BASELINE.json's north-rule precision/recall criterion).
"""

import os

import pytest

from llm_review_aggregation_spark import synth, textproc
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.plans.pipeline import run_pipeline

_WEIGHT_VARS = (
    "REALDEPS_ENTITY_WEIGHTS",
    "REALDEPS_RELATION_WEIGHTS",
    "REALDEPS_SENTIMENT_WEIGHTS",
)


def _missing_deps() -> list[str]:
    missing = []
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        missing.append("torch/transformers")
    try:
        textproc.nltk_backend()
    except NotImplementedError:
        missing.append("nltk(+punkt/treebank/pos_tag data)")
    finally:
        textproc.install_backend(None)  # never leak a backend into other tests
    missing += [v for v in _WEIGHT_VARS if not os.environ.get(v)]
    return missing


_MISSING = _missing_deps()

pytestmark = [
    pytest.mark.realdeps,
    pytest.mark.skipif(
        bool(_MISSING), reason=f"real-stack deps unavailable: {', '.join(_MISSING)}"
    ),
]


@pytest.fixture()
def nltk_tokenization():
    """Swap in the reference's tokenizer stack for the duration of a test.
    The UDF factories capture the backend at plan-build time, so this
    reaches executors (textproc.py 'Pluggable tokenizer backend')."""
    textproc.set_tokenizer_backend("nltk")
    yield
    textproc.install_backend(None)


def _prf(triples, want_pairs):
    syn = {s: c for c, ss in synth.SYNONYMS.items() for s in ss}
    got = {
        (syn.get(r["subj"], r["subj"]), syn.get(r["obj"], r["obj"]))
        for r in triples
        if r["pred"] == "partOf"
    }
    tp = len(got & want_pairs)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(want_pairs), 1)
    return precision, recall


def test_checkpoints_load_with_reference_prefixes():
    """The reference's net.state_dict() files (bert_base.*/fc.* attribute
    names) must load through bert_scorers._load without remapping."""
    from llm_review_aggregation_spark.functions import bert_scorers as bs

    tok_e = bs._load("entity", os.environ["REALDEPS_ENTITY_WEIGHTS"], 2)
    tok_r = bs._load("relation", os.environ["REALDEPS_RELATION_WEIGHTS"], 3)
    tok_s = bs._load("sentiment", os.environ["REALDEPS_SENTIMENT_WEIGHTS"], 4)
    assert tok_e and tok_r and tok_s


def test_e2e_triple_parity_real_stack(spark, nltk_tokenization, tmp_path):
    """E1-E7 with NLTK tokenization + trained BERT heads: planted-meronym
    P/R >= 0.95 — the differential gate the deterministic-scorer suite runs,
    now over the reference's real execution stack."""
    cfg = PipelineConfig(
        root_name="camera",
        scorer="bert",
        scorer_params={
            "entity_weights": os.environ["REALDEPS_ENTITY_WEIGHTS"],
            "relation_weights": os.environ["REALDEPS_RELATION_WEIGHTS"],
            "sentiment_weights": os.environ["REALDEPS_SENTIMENT_WEIGHTS"],
        },
    )
    pages = synth.synthesize_pages(spark, n_groups=4, docs_per_group=20)
    res = run_pipeline(spark, pages, cfg, work_dir=str(tmp_path / "realdeps"))
    rows = res.triples.collect()  # schema: (subj, pred, obj, score)
    precision, recall = _prf(rows, set(synth.MERONYMS.items()))
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_nltk_backend_feeds_miners(spark, nltk_tokenization):
    """Tokenizer-swap plumbing: with the NLTK backend installed, the
    distributed sentence segmentation must produce punkt sentence splits
    (executor-side capture, not just driver state)."""
    from llm_review_aggregation_spark.functions import cleaning, tokenize

    pages = synth.synthesize_pages(spark, n_groups=1, docs_per_group=4)
    sents = tokenize.segment_sentences(cleaning.extract_docs(pages))
    assert sents.count() > 0
    assert textproc.current_backend() is not None
    assert textproc.current_backend().name == "nltk"
