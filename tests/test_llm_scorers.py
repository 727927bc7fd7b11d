"""M7 LLM extraction path: prompt builders, parsers, the deterministic fake
client, and the scorer="llm" pipeline end-to-end (differential vs the
planted ground truth and vs the lexicon-scorer run)."""

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.functions import llm_scorers as ls
from llm_review_aggregation_spark.plans.pipeline import run_pipeline


class TestParsers:
    def test_parse_aspects_regex(self):
        text = (
            'noise [{"aspect": "lens", "polarity": "positive"}, '
            '{"aspect": "battery life", "polarity": "negative"}] trailing'
        )
        assert ls.parse_aspects(text) == [
            ("lens", "positive"),
            ("battery life", "negative"),
        ]
        assert ls.parse_aspects("") == []
        assert ls.parse_aspects("no json here") == []

    def test_parse_relation_directions(self):
        fwd = '{"part": "lens", "whole": "camera"}'
        assert ls.parse_relation(fwd, "lens", "camera") == (True, 1.0)
        assert ls.parse_relation(fwd, "camera", "lens") == (False, 1.0)
        # parsed pair not matching either aspect -> None
        assert ls.parse_relation(fwd, "screen", "body") is None
        assert ls.parse_relation("{}", "lens", "camera") is None


class TestFakeClient:
    @pytest.fixture
    def client(self):
        return ls.FakeLLMClient(
            aspect_terms=frozenset({"lens", "battery life"}),
            meronyms={"lens": "camera"},
            positive=frozenset({"great"}),
            negative=frozenset({"bad"}),
        )

    def test_aspect_roundtrip(self, client):
        [resp] = client.generate([ls.aspect_prompt("the lens is great")])
        assert ls.parse_aspects(resp) == [("lens", "positive")]

    def test_multiword_aspect(self, client):
        [resp] = client.generate([ls.aspect_prompt("bad battery life here")])
        assert ("battery life", "negative") in ls.parse_aspects(resp)

    def test_relation_roundtrip(self, client):
        [resp] = client.generate([ls.relation_prompt("the lens of the camera", "lens", "camera")])
        assert ls.parse_relation(resp, "lens", "camera") == (True, 1.0)
        [resp2] = client.generate([ls.relation_prompt("s", "camera", "lens")])
        assert ls.parse_relation(resp2, "camera", "lens") == (False, 1.0)
        [resp3] = client.generate([ls.relation_prompt("s", "screen", "body")])
        assert ls.parse_relation(resp3, "screen", "body") is None


class TestLLMPipeline:
    """scorer="llm" runs E4/E6/E7 through prompt->generate->parse and still
    recovers the planted ontology (P/R 1.0), matching the lexicon run's
    ontology edges exactly."""

    @pytest.fixture(scope="class")
    def results(self, spark):
        pages = synth.synthesize_pages(spark, n_groups=4, docs_per_group=18)
        llm_res = run_pipeline(spark, pages, PipelineConfig(root_name="camera", scorer="llm"))
        lex_res = run_pipeline(spark, pages, PipelineConfig(root_name="camera"))
        return llm_res, lex_res

    def test_partof_precision_recall(self, results):
        llm_res, _ = results
        canon = {s: c for c, ss in synth.SYNONYMS.items() for s in ss}
        triples = llm_res.triples.collect()
        part_of = {
            (canon.get(r["subj"], r["subj"]), canon.get(r["obj"], r["obj"]))
            for r in triples
            if r["pred"] != "hasAspectOpinion"
        }
        truth = set(synth.MERONYMS.items())
        tp = len(part_of & truth)
        assert tp / max(len(part_of), 1) >= 0.95
        assert tp / max(len(truth), 1) >= 0.95

    def test_ontology_edges_match_lexicon_run(self, results):
        llm_res, lex_res = results
        llm_edges = {(r["subj"], r["obj"]) for r in llm_res.ontology_edges.collect()}
        lex_edges = {(r["subj"], r["obj"]) for r in lex_res.ontology_edges.collect()}
        assert llm_edges == lex_edges

    def test_opinion_edges_present(self, results):
        llm_res, _ = results
        n_op = llm_res.triples.filter("pred = 'hasAspectOpinion'").count()
        assert n_op > 0


class _FlakyClient:
    """Fails n times with the given exception, then delegates to a canned
    answer; records call count."""

    batch_size = 4

    def __init__(self, fail_times, exc=ConnectionError):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = 0

    def generate(self, prompts, grammar=None):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc("transient")
        return ["ok"] * len(prompts)


class TestRetryingClient:
    def test_retries_then_succeeds_with_backoff(self):
        sleeps = []
        inner = _FlakyClient(2)
        c = ls.RetryingClient(
            inner, max_attempts=5, backoff_s=10.0, backoff_multiplier=2.0,
            sleep=sleeps.append, clock=lambda: 0.0,
        )
        with pytest.warns(RuntimeWarning):
            assert c.generate(["p1", "p2"]) == ["ok", "ok"]
        assert inner.calls == 3
        assert sleeps == [10.0, 20.0]  # exponential backoff between retries

    def test_bounded_attempts_reraise(self):
        inner = _FlakyClient(99)
        c = ls.RetryingClient(inner, max_attempts=3, backoff_s=1.0, sleep=lambda s: None)
        with pytest.raises(ConnectionError), pytest.warns(RuntimeWarning):
            c.generate(["p"])
        assert inner.calls == 3

    def test_fatal_errors_skip_retry(self):
        inner = _FlakyClient(99, exc=ValueError)
        c = ls.RetryingClient(
            inner, max_attempts=5, fatal=(ValueError,), sleep=lambda s: None
        )
        with pytest.raises(ValueError):
            c.generate(["p"])
        assert inner.calls == 1  # InvalidArgument-style errors never retry

    def test_min_interval_rate_limit(self):
        sleeps, now = [], [100.0]
        inner = _FlakyClient(0)
        c = ls.RetryingClient(
            inner, min_interval_s=10.0, sleep=sleeps.append, clock=lambda: now[0]
        )
        c.generate(["p"])
        now[0] += 4.0  # only 4s elapsed since last call -> sleep the gap
        c.generate(["p"])
        assert sleeps == [6.0]

    def test_satisfies_client_protocol(self):
        c = ls.RetryingClient(_FlakyClient(0))
        assert c.batch_size == 4


class TestGrammarPlumbing:
    def test_fallback_warns_once_without_transformers_cfg(self):
        ls._GRAMMAR_FALLBACK_WARNED = False
        with pytest.warns(RuntimeWarning, match="NOT"):
            assert ls.grammar_logits_processors(ls.ASPECT_GRAMMAR, object()) is None
        # second call: silent fallback (already warned)
        assert ls.grammar_logits_processors(ls.ASPECT_GRAMMAR, object()) is None

    def test_no_grammar_no_processor(self):
        assert ls.grammar_logits_processors(None, object()) is None

    def test_processor_built_when_dep_importable(self, monkeypatch):
        import sys
        import types

        built = {}

        class FakeConstraint:
            def __init__(self, grammar, root, tok):
                built["grammar"], built["root"], built["tok"] = grammar, root, tok

        class FakeProcessor:
            def __init__(self, constraint):
                built["constraint"] = constraint

        gm = types.ModuleType("transformers_cfg.grammar_utils")
        gm.IncrementalGrammarConstraint = FakeConstraint
        lp = types.ModuleType("transformers_cfg.generation.logits_process")
        lp.GrammarConstrainedLogitsProcessor = FakeProcessor
        pkg = types.ModuleType("transformers_cfg")
        gen = types.ModuleType("transformers_cfg.generation")
        monkeypatch.setitem(sys.modules, "transformers_cfg", pkg)
        monkeypatch.setitem(sys.modules, "transformers_cfg.generation", gen)
        monkeypatch.setitem(sys.modules, "transformers_cfg.grammar_utils", gm)
        monkeypatch.setitem(sys.modules, "transformers_cfg.generation.logits_process", lp)

        tok = object()
        procs = ls.grammar_logits_processors(ls.RELATION_GRAMMAR, tok)
        assert isinstance(procs, list) and isinstance(procs[0], FakeProcessor)
        assert built["grammar"] == ls.RELATION_GRAMMAR
        assert built["root"] == "root" and built["tok"] is tok

    def test_grammar_reaches_model_generate(self, monkeypatch):
        """End-to-end plumbing: HFLLMClient.generate passes the grammar
        processors as logits_processor, with fake torch/tokenizer/model."""
        import contextlib
        import sys
        import types

        import numpy as np

        seen = {}

        class FakeTok:
            def __call__(self, chunk, **kw):
                return {"input_ids": np.zeros((len(chunk), 3), dtype=int)}

            def batch_decode(self, toks, **kw):
                return ["out"] * toks.shape[0]

        class FakeModel:
            def generate(self, **kw):
                seen["logits_processor"] = kw.get("logits_processor")
                n = kw["input_ids"].shape[0]
                return np.zeros((n, 5), dtype=int)

        fake_torch = types.ModuleType("torch")
        fake_torch.no_grad = contextlib.nullcontext
        monkeypatch.setitem(sys.modules, "torch", fake_torch)

        client = ls.HFLLMClient(model_name="fake")
        monkeypatch.setattr(
            ls.HFLLMClient, "_load", lambda self: (FakeTok(), FakeModel())
        )
        marker = ["PROC"]
        monkeypatch.setattr(ls, "grammar_logits_processors", lambda g, t: marker)
        assert client.generate(["p"], ls.ASPECT_GRAMMAR) == ["out"]
        assert seen["logits_processor"] is marker


class TestNShotPrompts:
    EX = (("Review: great lens", '[{"aspect": "lens", "polarity": "positive"}]'),)

    def test_exemplars_ride_through_aspect_prompt(self):
        p = ls.aspect_prompt("the strap broke", self.EX)
        assert "Examples:" in p and "Review: great lens" in p
        assert p.index("great lens") < p.index("the strap broke")

    def test_zero_shot_unchanged(self):
        assert "Examples:" not in ls.aspect_prompt("plain review")

    def test_exemplars_ride_through_relation_prompt(self):
        ex = (("Sentence: x\nAspect1: a\nAspect2: b", '{"part": "a", "whole": "b"}'),)
        p = ls.relation_prompt("the lens of the camera", "lens", "camera", ex)
        assert "Examples:" in p and '{"part": "a", "whole": "b"}' in p

    def test_fake_client_answers_last_review_despite_exemplar_markers(self):
        client = ls.FakeLLMClient(aspect_terms=frozenset({"strap", "lens"}))
        ex = ((f"{ls._REVIEW_OPEN}\ngreat lens\n{ls._REVIEW_CLOSE}",
               '[{"aspect": "lens", "polarity": "positive"}]'),)
        out = client.generate([ls.aspect_prompt("bad strap", ex)])[0]
        assert ls.parse_aspects(out) == [("strap", "neutral")]

    def test_scorer_adapters_forward_exemplars(self):
        class Spy:
            batch_size = 8
            prompts = []

            def generate(self, prompts, grammar=None):
                Spy.prompts = list(prompts)
                return ["[]"] * len(prompts)

        import pandas as pd

        scorer = ls.LLMEntityScorer(Spy(), examples=self.EX)
        pdf = pd.DataFrame(
            {"masked_tokens": [["the", "<mask>", "works"]], "entity_idx": [1],
             "entity": ["lens"]}
        )
        scorer.score_entities(pdf)
        assert all("Review: great lens" in p for p in Spy.prompts)
