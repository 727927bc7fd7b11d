"""M8/A18 LLM-judge stage: parser, fake client, DataFrame passes, averaging
and write-back join — end-to-end over the pipeline's ontology edges."""

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.functions import judge
from llm_review_aggregation_spark.plans.pipeline import run_pipeline


class TestParser:
    @pytest.mark.parametrize(
        "text,score",
        [
            ("Score: [[4]] because ...", 4),
            ("Score: 3", 3),
            ("**Score:** [[5]]\nexplanation", 5),
            ("no score here", 0),
            ("", 0),
        ],
    )
    def test_parse(self, text, score):
        assert judge.parse_judge_score(text) == score


class TestFakeJudge:
    def test_grades_aspects_and_relations(self):
        client = judge.make_fake_judge()
        a_good = judge.aspect_judge_prompt("camera", "lens")
        a_bad = judge.aspect_judge_prompt("camera", "asdf")
        r_good = judge.relation_judge_prompt("camera", "camera", "lens")
        r_bad = judge.relation_judge_prompt("camera", "lens", "camera")
        out = [judge.parse_judge_score(t) for t in client.generate([a_good, a_bad, r_good, r_bad])]
        assert out == [5, 1, 5, 1]

    def test_synonym_canonicalized(self):
        client = judge.make_fake_judge()
        # "display" is a synonym surface of "screen", a true part of camera
        [resp] = client.generate([judge.relation_judge_prompt("camera", "camera", "display")])
        assert judge.parse_judge_score(resp) == 5


class TestJudgePasses:
    @pytest.fixture(scope="class")
    def result(self, spark):
        pages = synth.synthesize_pages(spark, n_groups=3, docs_per_group=12)
        return run_pipeline(spark, pages, PipelineConfig(root_name="camera"))

    def test_judge_ontology_edges_all_true(self, spark, result):
        client = judge.make_fake_judge()
        scored = judge.judge_ontology_edges(result.ontology_edges, client, "camera")
        rows = scored.collect()
        assert rows, "pipeline produced no ontology edges"
        # the pipeline recovers the planted meronomy -> every edge judges 5
        assert all(r["judge_score"] == 5 for r in rows)
        assert judge.average_relation_score(scored) == 5.0

    def test_judge_aspects(self, spark, result):
        client = judge.make_fake_judge()
        scored = judge.judge_aspects(result.aspects, client, "camera")
        by_term = {r["term"]: r["judge_score"] for r in scored.collect()}
        assert by_term, "no aspects to judge"
        true_terms = set(synth.ASPECT_TERMS)
        for term, s in by_term.items():
            assert s == (5 if term in true_terms else 1), term

    def test_write_back_join(self, spark, result):
        client = judge.make_fake_judge()
        scored = judge.judge_ontology_edges(result.ontology_edges, client, "camera")
        enriched = judge.attach_judge_scores(result.ontology_edges, scored)
        assert "judge_score" in enriched.columns
        assert enriched.count() == result.ontology_edges.count()
        assert enriched.filter("judge_score IS NULL").count() == 0


class TestJudgeNShot:
    def test_exemplars_ride_through_judge_prompts(self):
        ex = (("Product: camera\nTerm: lens", "Score: [[5]] core component"),)
        p = judge.aspect_judge_prompt("camera", "strap", ex)
        assert "Examples:" in p and "Score: [[5]]" in p
        assert p.rstrip().endswith("Term: strap")
        rp = judge.relation_judge_prompt("camera", "camera", "lens", ex)
        assert "Examples:" in rp and rp.rstrip().endswith("Child: lens")

    def test_fake_judge_grades_last_item_despite_exemplars(self, spark):
        client = judge.FakeJudgeClient(meronyms={"lens": "camera"})
        ex = (("Parent: camera\nChild: lens", "Score: [[5]]"),)
        edges = spark.createDataFrame([("strap", "camera")], "subj string, obj string")
        scored = judge.judge_ontology_edges(edges, client, "camera", examples=ex).collect()
        assert scored[0]["judge_score"] == 1  # graded the real edge, not the exemplar
