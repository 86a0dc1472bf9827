"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; sign-LSH (random hyperplane)
bucketing as the scale path (candidates from matching buckets only).

Vector math is pure Catalyst array algebra (zip_with + aggregate → JVM
codegen, no Python). Hyperplanes are deterministic (seeded) and shipped as
literal arrays — at 64-dim × 16 planes that is ~4 KB of plan, broadcast free.

Scale notes:
  * brute-force is a broadcast nested-loop of queries × corpus: right-sized
    when |queries| is small (the common "probe" case). For corpus × corpus
    use the LSH bucket join (equi-join on bucket id — shuffles once).
  * IVF-style coarse quantization would replace the random planes with
    k-means centroids; the bucket-join topology is identical, so the
    plumbing here is the scale path either way.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_sim_expr(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return F.when(
        (norm_a > 0) & (norm_b > 0), dot_expr(a, b) / (norm_a * norm_b)
    ).otherwise(F.lit(0.0))


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        norm_expr(F.col(vec_col).cast("array<double>")).alias("norm"),
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus scan.

    -> (query_id, neighbor_id, rank, cosine). Ties broken by neighbor id
    (deterministic). Self-matches (same id) excluded.
    """
    c = with_norm(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    q = with_norm(queries, query_id_col if query_id_col in queries.columns else id_col, vec_col)
    qid = query_id_col if query_id_col in queries.columns else id_col
    q = (
        q.withColumnRenamed(qid, "query_id")
        .withColumnRenamed(vec_col, "__qv")
        .withColumnRenamed("norm", "__qn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine_sim_expr(
                    F.col(vec_col), F.col("__qv"), F.col("norm"), F.col("__qn")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def signlsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (dot(v, plane) >= 0)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_expr(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_bucket_candidates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Corpus×corpus ANN candidates: pairs sharing a sign-LSH bucket in any
    of `n_tables` independent tables. One equi-join per table (unioned)."""
    outs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        b = emb.select(
            F.col(id_col),
            signlsh_bucket_expr(F.col(vec_col).cast("array<double>"), planes).alias(
                "bucket"
            ),
        )
        left = b.select(F.col("bucket"), F.col(id_col).alias("id_a"))
        right = b.select(F.col("bucket"), F.col(id_col).alias("id_b"))
        outs.append(
            left.join(right, on="bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.union(o)
    return df.distinct()


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in any table. Recall grows with n_tables / shrinks with
    n_planes; exactness is traded for a bucket-join instead of a full scan.

    Defaults (4 planes x 8 tables) target weak-similarity corpora (nearest
    cosine ~0.3 => collision p~0.61/plane => ~0.70 recall). For clustered
    embeddings (near-dup mining at cosine>0.9) use n_planes 8-12: collision
    p~0.9/plane makes buckets sharp AND recall ~1 — that is the 100 TB
    regime where this beats the brute-force scan by orders of magnitude."""
    scored_parts = []
    c = with_norm(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    q = with_norm(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        cb = c.withColumn("bucket", signlsh_bucket_expr(F.col(vec_col), planes))
        qb = (
            q.withColumn("bucket", signlsh_bucket_expr(F.col(vec_col), planes))
            .withColumnRenamed(vec_col, "__qv")
            .withColumnRenamed("norm", "__qn")
        )
        scored_parts.append(
            cb.join(F.broadcast(qb), on="bucket").select(
                "query_id", "neighbor_id", vec_col, "norm", "__qv", "__qn"
            )
        )
    cand = scored_parts[0]
    for sp in scored_parts[1:]:
        cand = cand.union(sp)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            cosine_sim_expr(F.col(vec_col), F.col("__qv"), F.col("norm"), F.col("__qn")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
