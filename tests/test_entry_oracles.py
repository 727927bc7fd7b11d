"""Driver-style oracle gates for the round-5-converted run-artifact queries.

kg_judge_scores and kg_lineage became oracle-backed by pinning the
deterministic sf0.001 pipeline artifacts inside their DuckDB restatements
(the judge S-curve recomputed from the lexicon; the expected lineage stage
table). A pinned literal can go stale if the pipeline's dataflow ever
changes, so this suite re-runs each Spark query AND its oracle SQL side by
side — the same compare the correctness driver does — and fails loudly on
any divergence. Also pins that every queries() key has either an
oracle_sql() entry or is one of the two documented full-pipeline
exceptions.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

ROWS_ONLY = {"kg_triples", "kg_triples_pr"}  # full-pipeline replay semantics


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> list[list[str]]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(9)
    return sorted(out.astype(str).values.tolist())


@pytest.mark.parametrize("name", ["kg_judge_scores", "kg_lineage"])
def test_pinned_oracle_matches_fresh_run(spark, name):
    sdf = entrymod.queries()[name](spark, "/root/testdata/sf0.001").toPandas()
    odf = _duck(entrymod.oracle_sql()[name])
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert _canon(sdf) == _canon(odf)


def test_every_query_is_oracle_backed_or_documented():
    qs = set(entrymod.queries())
    oq = set(entrymod.oracle_sql())
    assert oq <= qs, oq - qs
    assert qs - oq == ROWS_ONLY, qs - oq
