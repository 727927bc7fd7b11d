"""Cache lifecycle of run_pipeline (round-5 verdict item #2).

run_pipeline caches `sentences` for its 7 downstream passes — correct for
one run, but a long-lived session making repeated calls (exactly what
`__spark_entry__.queries()` does: kg_triples then kg_triples_pr each run
the pipeline) would accumulate cached blocks forever. PipelineResult.release
(also the context-manager exit) unpersists the run-scoped cache; these tests
pin that every RDD id a run ADDS to the session's persistent-RDD registry is
gone after release, and that released results stay usable.

Assertions track the specific ids the run added rather than global counts:
the session-scoped spark fixture is shared with modules whose fixtures hold
live cached results, and Spark's ContextCleaner unpersists garbage-collected
RDDs asynchronously — both make absolute/relative counts racy under the full
suite.
"""

from __future__ import annotations

import pytest

from llm_review_aggregation_spark import synth
from llm_review_aggregation_spark.config import PipelineConfig
from llm_review_aggregation_spark.plans.pipeline import run_pipeline

CFG = PipelineConfig(root_name="camera")


def _cached_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


@pytest.fixture()
def pages(spark):
    # docs_per_group=9 is used by NO other suite: Spark's CacheManager keys
    # cache entries on the canonicalized plan, so a corpus shared with a
    # long-lived fixture elsewhere would DEDUPE the sentences cache into
    # that fixture's entry — this run would add no new RDD id and release()
    # would drop a shared cache, making the assertions racy under the full
    # suite.
    return synth.synthesize_pages(spark, n_groups=2, docs_per_group=9)


class TestRelease:
    def test_release_clears_the_run_cache(self, spark, pages):
        base = _cached_ids(spark)
        res = run_pipeline(spark, pages, CFG)
        res.triples.count()
        added = _cached_ids(spark) - base
        assert added  # sentences is cached during the run
        res.release()
        assert not (_cached_ids(spark) & added)

    def test_release_is_idempotent_and_result_stays_usable(self, spark, pages):
        base = _cached_ids(spark)
        res = run_pipeline(spark, pages, CFG)
        n = res.triples.count()
        added = _cached_ids(spark) - base
        res.release()
        res.release()
        # uncached recompute, same answer
        assert res.triples.count() == n
        assert not (_cached_ids(spark) & added)

    def test_context_manager_releases(self, spark, pages):
        base = _cached_ids(spark)
        with run_pipeline(spark, pages, CFG) as res:
            assert res.triples.count() > 0
            added = _cached_ids(spark) - base
            assert added
        assert not (_cached_ids(spark) & added)

    def test_degenerate_path_releases_too(self, spark, pages):
        base = _cached_ids(spark)
        with run_pipeline(spark, pages.limit(0), CFG) as res:
            assert res.triples.count() == 0
            added = _cached_ids(spark) - base
        assert not (_cached_ids(spark) & added)

    def test_repeated_runs_do_not_accumulate(self, spark, pages):
        base = _cached_ids(spark)
        added: set[int] = set()
        for _ in range(3):
            with run_pipeline(spark, pages, CFG) as res:
                res.triples.count()
                added |= _cached_ids(spark) - base
        assert added
        assert not (_cached_ids(spark) & added)
