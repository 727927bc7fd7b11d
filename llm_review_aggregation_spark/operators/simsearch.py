"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the corpus, JVM-side dot products (zip_with + aggregate,
  whole-stage codegen; no Python in the hot path), windowed top-k.
  The baseline and the verifier for the approximate path.
- ``hyperplane_buckets`` + ``lsh_topk``: random-hyperplane LSH — each
  vector lands in a 2^planes sign bucket; queries probe their bucket plus
  hamming<=probe_hamming neighbors. Bucket assignment is one narrow map;
  the join shuffles on bucket keys only.

Hyperplanes are seeded (numpy RandomState) so results are deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str):
    return F.sqrt(
        F.aggregate(F.transform(F.col(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_expr(a: str, b: str):
    return dot_expr(a, b) / F.greatest(norm_expr(a) * norm_expr(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, q_id_col: str, k: int = 10
) -> DataFrame:
    """(q_id, id, cosine, rank) — exact top-k by cosine; ties broken by id
    for determinism. `queries` must be broadcast-small."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(vec_col).alias("qvec"))
    scored = c.crossJoin(F.broadcast(q)).withColumn("cosine", cosine_expr("cvec", "qvec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cosine", "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    rs = np.random.RandomState(seed)
    return rs.randn(planes, dim).tolist()


def _bucket_expr(vec_col: str, hps: list[list[float]]):
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(F.col(vec_col), F.array(*[F.lit(float(v)) for v in hp]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for hp in hps
    ]
    bucket = F.lit(0)
    for i, b in enumerate(bits):
        bucket = bucket + (b * F.lit(2**i))
    return bucket


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: int = 12,
    probe_hamming: int = 0,
    dim: int | None = None,
    seed: int = 42,
    tables: int = 1,
) -> DataFrame:
    """(id, bucket). `tables` independent hash tables (separately seeded
    hyperplane sets) trade index size for recall; bucket ids are namespaced
    per table so the downstream join stays a single equi-join. With
    probe_hamming=h > 0, each row is additionally replicated into every
    bucket within hamming distance h of its own (multi-probe on the *index*
    side keeps the query-side join plain)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    per_table = []
    for t in range(tables):
        hps = _hyperplanes(dim, planes, seed + 1000 * t)
        per_table.append(_bucket_expr(vec_col, hps) + F.lit(t * 2**planes))
    out = df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*per_table)).alias("bucket0")
    )
    if probe_hamming <= 0:
        return out.select("id", F.col("bucket0").alias("bucket"))
    flips = [0] + [2**i for i in range(planes)]
    if probe_hamming >= 2:
        flips += [2**i + 2**j for i in range(planes) for j in range(i + 1, planes)]
    return out.select(
        "id",
        F.explode(F.array(*[F.col("bucket0").bitwiseXOR(F.lit(fl)) for fl in flips])).alias("bucket"),
    ).distinct()


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    q_id_col: str,
    k: int = 10,
    planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: bucket-joined candidates, exact cosine re-rank."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = hyperplane_buckets(corpus, vec_col, id_col, planes, probe_hamming, dim, seed, tables)
    qb = hyperplane_buckets(queries, vec_col, q_id_col, planes, 0, dim, seed, tables).withColumnRenamed(
        "id", "q_id"
    )
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(vec_col).alias("qvec"))
    cand = cb.join(qb, "bucket").select("q_id", "id").distinct()
    scored = (
        cand.join(c, "id")
        .join(F.broadcast(q), "q_id")
        .withColumn("cosine", cosine_expr("cvec", "qvec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cosine", "rank")
    )
