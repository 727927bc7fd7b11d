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
