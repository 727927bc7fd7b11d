"""Skew handling: salted pre-aggregation (north rule: "skewed head entities
are handled with salted pre-aggregation and AQE skew-join hints").

For algebraic aggregates (count/sum/min/max) Catalyst's partial (map-side)
aggregation already neutralizes key skew — one combiner row per partition per
key. Salting earns its keep where partial aggregation does NOT apply or does
not bound state:

- holistic aggregates with per-key state proportional to group size
  (collect_list/collect_set of phrases per head aspect);
- two-phase top-k per key over skewed keys;
- pre-aggregation before a shuffle join on a skewed key (paired with AQE
  skew-join splitting for the residual join).

``salted_agg`` runs groupBy(keys + salt) -> partial aggregate ->
groupBy(keys) -> merge. The salt spreads one hot key over ``salt_mod``
reducers in phase 1, bounding any single task's state.

Reference analog: the A1/A6 accumulations (Counter updates / matrix sums,
aspects/manager.py:34-36, bert_rel_extractor.py:46-68) are single-process in
the reference; SURVEY §4 "Skew handling" specifies this generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_mod: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt (hash of all columns, stable across runs)."""
    return df.withColumn(
        col_name, F.pmod(F.hash(F.struct(*[F.col(c) for c in df.columns])), F.lit(salt_mod))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt_mod: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the partials
    per keys. Column names must line up: each merge agg consumes the alias its
    partial produced.

    Example — skew-safe distinct-phrase collection per aspect::

        salted_agg(
            df, ["aspect"],
            partial_aggs=[F.collect_set("phrase").alias("ps")],
            merge_aggs=[F.array_distinct(F.flatten(F.collect_list("ps"))).alias("phrases")],
        )
    """
    salted = with_salt(df, salt_mod)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_count(df: DataFrame, keys: list[str], salt_mod: int = 16) -> DataFrame:
    """Skew-safe count per key (equivalent to groupBy(keys).count())."""
    return salted_agg(
        df,
        keys,
        partial_aggs=[F.count(F.lit(1)).alias("_c")],
        merge_aggs=[F.sum("_c").alias("count")],
        salt_mod=salt_mod,
    )


def salted_topk_by_count(df: DataFrame, key: str, k: int, salt_mod: int = 16) -> DataFrame:
    """Global top-k keys by frequency with the lexicographic tiebreak pinned
    (SURVEY §7 R1) — the skew-safe form of A2 candidate ranking."""
    counts = salted_count(df, [key], salt_mod)
    return counts.orderBy(F.desc("count"), F.asc(key)).limit(k)
