"""Bucketed table layout for shuffle-free repeated joins.

At 100 TB the dominant cost of the relational stages is the shuffle on the
join key (orders x lineitem style fact joins, or pages x per-url side
tables). Spark's answer is bucketing: write both sides hash-bucketed (and
sorted) on the join key once, and every subsequent equi-join or groupBy on
that key skips its Exchange — the scan itself is the partitioning proof.
The reference has no analog (single Postgres node; `db/manager.py` indexes
play this role); this module is the engine-forward layout tool the
north-rule's cluster deployment would use for its hot join keys.

Usage shape (also exercised by tests/test_bucketing.py, which asserts the
executed plans contain NO Exchange on the bucketed sides):

    bucketing.write_bucketed(orders, "orders_b", "o_custkey", n_buckets=8)
    bucketing.write_bucketed(customer, "customer_b", "c_custkey", n_buckets=8)
    joined = bucketing.read_table(spark, "orders_b").join(
        bucketing.read_table(spark, "customer_b"),
        F.col("o_custkey") == F.col("c_custkey"),
    )   # <- sort-merge join with zero shuffle on either side

Bucket count discipline: both sides must agree on n_buckets (or be exact
multiples, which Spark can coalesce when
`spark.sql.bucketing.coalesceBucketsInJoin.enabled` is set); pick
n_buckets ~= cluster cores x small-factor at deploy scale so each bucket
is one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a managed table hash-bucketed (and, by default,
    sorted) on `key`. One shuffle now buys zero shuffles for every later
    join/aggregate on `key`."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table; Catalyst reads `outputPartitioning` from the
    bucket spec, so downstream joins/aggregations on the bucket key plan
    without an Exchange."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the df's executed plan contains a SHUFFLE Exchange —
    the assertion helper for co-location tests (EnsureRequirements inserts
    `Exchange hashpartitioning(...)` exactly when bucketing did NOT satisfy
    the join's distribution requirement). Matches the shuffle operator
    specifically: a bare "Exchange" substring would also hit
    BroadcastExchange, which is not a shuffle and is exactly what a
    well-broadcast plan should contain."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # a shuffle prints as "Exchange hashpartitioning(...)" / "Exchange
    # rangepartitioning(...)" / "Exchange RoundRobinPartitioning(...)" /
    # "Exchange SinglePartition"; a broadcast prints as "BroadcastExchange".
    # "ReusedExchange" is excluded too: it never executes a shuffle itself —
    # it re-reads another exchange's output, and when that target is a
    # shuffle the original "Exchange ..." line is elsewhere in the same
    # plan and matches on its own (so a broadcast-only plan with exchange
    # reuse does not falsely report a shuffle).
    return bool(re.search(r"(?<!Broadcast)(?<!Reused)Exchange\s", plan))
