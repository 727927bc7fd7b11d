"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the corpus, JVM-side dot products (zip_with + aggregate,
  whole-stage codegen; no Python in the hot path), windowed top-k.
  The baseline and the verifier for the approximate path.
- ``hyperplane_buckets`` + ``lsh_topk``: random-hyperplane LSH — each
  vector lands in a 2^planes sign bucket; queries probe their bucket plus
  hamming<=probe_hamming neighbors. Bucket assignment is one narrow map;
  the join shuffles on bucket keys only.

Hyperplane coefficients are generated *inside* the column expression from a
seeded hash of (table, plane, component-index), so bucketing needs neither
the vector dimension up front nor any driver-side action — the whole plan
is declared lazily and stays in whole-stage codegen.
"""

from __future__ import annotations

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


def _plane_coef(plane_key: int, j):
    """Deterministic pseudo-random coefficient in [-1, 1] for component j of
    hyperplane `plane_key` — murmur3 of (key, j) scaled. Declared as a column
    expression, so no dimension needs to be known at plan time."""
    return (F.pmod(F.hash(F.lit(plane_key), j), F.lit(2_000_001)) / F.lit(1_000_000.0)) - F.lit(1.0)


def _bucket_expr(vec_col: str, planes: int, seed: int):
    def _proj_lambda(plane_key: int):
        return lambda x, j: x * _plane_coef(plane_key, j)

    bucket = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(
            F.transform(F.col(vec_col), _proj_lambda(seed * 7919 + p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: int = 12,
    probe_hamming: int = 0,
    seed: int = 42,
    tables: int = 1,
) -> DataFrame:
    """(id, bucket). `tables` independent hash tables (separately seeded
    hyperplane sets) trade index size for recall; bucket ids are namespaced
    per table so the downstream join stays a single equi-join. With
    probe_hamming=h > 0, each row is additionally replicated into every
    bucket within hamming distance h of its own (multi-probe on the *index*
    side keeps the query-side join plain)."""
    per_table = []
    for t in range(tables):
        per_table.append(_bucket_expr(vec_col, planes, seed + 1000 * t) + F.lit(t * 2**planes))
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
    """Approximate top-k: bucket-joined candidates, exact cosine re-rank.
    Fully lazy — no driver-side action before the plan executes."""
    cb = hyperplane_buckets(corpus, vec_col, id_col, planes, probe_hamming, seed, tables)
    qb = hyperplane_buckets(queries, vec_col, q_id_col, planes, 0, seed, tables).withColumnRenamed(
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
