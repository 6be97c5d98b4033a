"""Approximate nearest-neighbor search over embedding columns.

Brute-force cosine top-k is the correctness baseline (fully JVM-side:
``zip_with`` + ``aggregate`` fold, broadcast query set); the LSH
variant (random-hyperplane sign buckets) is the scale path — the
brute-force cross product is O(N·Q), the LSH one only compares within
buckets, partitioned by bucket key.

Hyperplanes are pseudo-random but deterministic: plane_i[j] =
sin(i*997 + j) — reproducible in ANSI SQL for oracle checks and
identical across runs/cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str,
    n_queries: int = 5, k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` ids (deterministic)
    against the whole table. Query side is broadcast — no shuffle of
    the big side."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("norm", _norm(F.col("vec")))
    queries = base.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("norm") * F.col("qnorm")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 8):
    """Deterministic pseudo-random hyperplane matrix as a literal
    array-of-arrays column: plane_i[j] = sin(i*997 + j)."""
    import math

    return [
        [math.sin(i * 997 + j) for j in range(dim)]
        for i in range(n_planes)
    ]


def lsh_bucket(vec_col, planes) -> "F.Column":
    """Sign-bit bucket id of a vector against the hyperplanes —
    pure JVM expression."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = _dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def lsh_topk(
    df: DataFrame, id_col: str, vec_col: str,
    n_queries: int = 5, k: int = 10, n_planes: int = 6, dim: int = 64,
) -> DataFrame:
    """ANN via random-hyperplane LSH: candidates share the query's
    sign-bucket; exact cosine re-rank within the bucket. Recall is
    approximate by construction — the scale path for 10^10-row
    embedding tables (bucket-partitioned shuffle instead of a cross
    product)."""
    planes = hyperplanes(dim, n_planes)
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("norm", _norm(F.col("vec")))
        .withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    )
    queries = base.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        base.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("norm") * F.col("qnorm")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
