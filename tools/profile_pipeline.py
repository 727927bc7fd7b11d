"""Per-stage wall-time profile of the flagship KG pipeline.

Usage: python tools/profile_pipeline.py [sf_dir] [cpus]

Forces each stage with an eager localCheckpoint so the timing per stage is
visible; prints a stage table plus the total.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from llm_review_aggregation_spark import synth  # noqa: E402
from llm_review_aggregation_spark.plans import pipeline as pl  # noqa: E402
from llm_review_aggregation_spark.session import get_spark  # noqa: E402


class TimingStore:
    def __init__(self, spark):
        self.spark = spark
        self.times: dict[str, float] = {}

    def run_table(self, stage, fn, resume=True):
        t0 = time.monotonic()
        df = fn().localCheckpoint(eager=True)
        self.times[stage] = time.monotonic() - t0
        return df

    def run_artifact(self, stage, fn, resume=True):
        t0 = time.monotonic()
        v = fn()
        self.times[stage] = time.monotonic() - t0
        return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark(app_name="profile", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    store = TimingStore(spark)
    orig = pl.EphemeralStore
    pl.EphemeralStore = lambda s: store  # noqa: E731
    try:
        pages = synth.pages_from_documents(spark, sf_dir, replicate=replicate)
        t0 = time.monotonic()
        res = pl.run_pipeline(spark, pages, entrymod._KG_CFG)
        n = res.triples.count()
        total = time.monotonic() - t0
    finally:
        pl.EphemeralStore = orig

    acc = 0.0
    for k, v in store.times.items():
        print(f"{k:20s} {v:8.2f}s")
        acc += v
    print(f"{'(untimed glue)':20s} {total-acc:8.2f}s")
    print(f"{'TOTAL':20s} {total:8.2f}s   triples={n} cpus={cpus}")
    spark.stop()


if __name__ == "__main__":
    main()
