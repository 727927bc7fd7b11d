"""Cache lifecycle of run_pipeline (round-5 verdict item #2).

run_pipeline caches `sentences` for its 7 downstream passes — correct for
one run, but a long-lived session making repeated calls (exactly what
`__spark_entry__.queries()` does: kg_triples then kg_triples_pr each run
the pipeline) would accumulate cached blocks forever. PipelineResult.release
(also the context-manager exit) unpersists the run-scoped cache; these tests
pin that the session's persistent-RDD registry returns to its pre-run state
afterwards and that released results stay usable.

Assertions are baseline-relative, not absolute: the session-scoped spark
fixture is shared with modules whose fixtures legitimately hold live
(cached) pipeline results.
"""

from __future__ import annotations

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.plans.pipeline import run_pipeline

CFG = PipelineConfig(root_name="camera")


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def pages(spark):
    return synth.synthesize_pages(spark, n_groups=2, docs_per_group=6)


class TestRelease:
    def test_release_clears_persistent_rdds(self, spark, pages):
        base = _n_cached(spark)
        res = run_pipeline(spark, pages, CFG)
        res.triples.count()
        assert _n_cached(spark) > base  # sentences is cached during the run
        res.release()
        assert _n_cached(spark) == base

    def test_release_is_idempotent_and_result_stays_usable(self, spark, pages):
        base = _n_cached(spark)
        res = run_pipeline(spark, pages, CFG)
        n = res.triples.count()
        res.release()
        res.release()
        # uncached recompute, same answer
        assert res.triples.count() == n
        assert _n_cached(spark) == base

    def test_context_manager_releases(self, spark, pages):
        base = _n_cached(spark)
        with run_pipeline(spark, pages, CFG) as res:
            assert res.triples.count() > 0
            assert _n_cached(spark) > base
        assert _n_cached(spark) == base

    def test_degenerate_path_releases_too(self, spark, pages):
        base = _n_cached(spark)
        with run_pipeline(spark, pages.limit(0), CFG) as res:
            assert res.triples.count() == 0
        assert _n_cached(spark) == base

    def test_repeated_runs_do_not_accumulate(self, spark, pages):
        base = _n_cached(spark)
        for _ in range(3):
            with run_pipeline(spark, pages, CFG) as res:
                res.triples.count()
        assert _n_cached(spark) == base
