"""E5 scale path: distributed PPMI + sparse-cosine + label-propagation
canonicalization (operators/canonicalize.cluster_synsets_scale), forced via
max_driver_cluster_terms=1 so the pipeline takes the large-dictionary branch.
"""

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def scale_result(spark):
    pages = synth.synthesize_pages(spark, n_groups=4, docs_per_group=20)
    cfg = PipelineConfig(root_name="camera", max_driver_cluster_terms=1)
    return run_pipeline(spark, pages, cfg)


class TestScalePathSynsets:
    def test_synsets_partition_terms(self, scale_result):
        members = [m for ms in scale_result.synset_map.values() for m in ms]
        assert len(members) == len(set(members))

    def test_known_synonyms_cocluster(self, scale_result):
        by_member = {m: c for c, ms in scale_result.synset_map.items() for m in ms}
        assert by_member["camera"] == by_member["cam"]
        assert by_member["screen"] == by_member["display"]
        assert by_member["picture"] == by_member["image"] == by_member["photo"]

    def test_root_is_representative(self, scale_result):
        assert "camera" in scale_result.synset_map
        assert "camera" in scale_result.synset_map["camera"]

    def test_planted_meronymy_recovered(self, scale_result):
        canon = {s: c for c, ss in synth.SYNONYMS.items() for s in ss}
        edges = [
            (r["subj"], r["obj"])
            for r in scale_result.triples.filter("pred='partOf'").collect()
        ]
        got = {(canon.get(a, a), canon.get(b, b)) for a, b in edges}
        truth = set(synth.MERONYMS.items())
        tp = len(got & truth)
        assert tp / max(len(got), 1) >= 0.95
        assert tp / len(truth) >= 0.95
