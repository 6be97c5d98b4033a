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


def quantize_fixed_point(vec_col, scale: float = 1000.0):
    """Fixed-point quantization: floor(x*scale + 0.5) as long.

    Each step (cast float->double, one multiply, one add, floor) is a
    single IEEE-754 operation, so the result is bit-identical in Spark
    and in the DuckDB oracle — all downstream IVF *training* arithmetic
    (squared distances, integer-division means) is exact int64 math
    with zero float-summation-order risk. Quantized (int8/int16/fixed-
    point) vectors are also the standard ANN memory layout at scale,
    so this is the representation a 100 TB deployment would store."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x * F.lit(scale) + F.lit(0.5)).cast("long"),
    )


def _int_sqdist(qv_col, centroid):
    """Exact int64 squared L2 distance between a quantized vector
    column and a Python centroid literal — pure JVM fold."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qv_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dist_structs(qv_col, centroids):
    """Array of (squared-distance, list-id) structs, one per centroid.
    ``array_sort`` on it yields ascending distance with ties broken by
    the lowest list id — the argmin/probe-ranking convention the
    DuckDB oracle replicates with ``row_number() OVER (ORDER BY d, i)``."""
    return F.array(*[
        F.struct(
            _int_sqdist(qv_col, c).alias("d"), F.lit(i).alias("i")
        )
        for i, c in enumerate(centroids)
    ])


def train_ivf_centroids(
    df: DataFrame, id_col: str, vec_col: str,
    k_lists: int = 8, iters: int = 2,
) -> list:
    """Lloyd's k-means coarse quantizer over fixed-point vectors.

    Deterministic init (the ``k_lists`` lowest-id vectors), then
    ``iters`` rounds of assign (exact int64 argmin, ties to the lowest
    list id) + recompute (elementwise floor(sum/count) integer mean;
    an empty list keeps its previous centroid). The assign and the
    per-dimension mean are distributed DataFrame ops (posexplode +
    groupBy); only the k_lists x dim aggregate (a few KB) is collected
    per iteration — the same small-side-collect posture as
    dedup_components. floor(sum/count) via double division is exact
    while |sum| < 2^53 and the quotient is at least 1/count away from
    any integer it doesn't hit exactly — true for any realistic list
    size, and bit-identical in the DuckDB oracle."""
    base = df.select(
        F.col(id_col).alias("id"),
        quantize_fixed_point(
            F.col(vec_col).cast("array<double>")
        ).alias("qv"),
    )
    cents = [
        list(r["qv"])
        for r in base.filter(F.col("id") < k_lists)
        .orderBy("id")
        .collect()
    ]
    for _ in range(iters):
        assigned = base.withColumn(
            "lst", F.array_sort(_dist_structs(F.col("qv"), cents))[0]["i"]
        )
        rows = (
            assigned.select("lst", F.posexplode("qv").alias("j", "v"))
            .groupBy("lst", "j")
            .agg(
                F.floor(
                    F.sum("v").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).cast("long").alias("m")
            )
            .collect()
        )
        by_list: dict = {}
        for r in rows:
            by_list.setdefault(r["lst"], {})[r["j"]] = r["m"]
        cents = [
            [by_list[i][j] for j in sorted(by_list[i])]
            if i in by_list else cents[i]
            for i in range(k_lists)
        ]
    return cents


def ivf_topk(
    df: DataFrame, id_col: str, vec_col: str,
    k_lists: int = 8, iters: int = 2, nprobe: int = 3,
    n_queries: int = 5, k: int = 10,
) -> DataFrame:
    """ANN via an IVF (inverted-file) index: a k-means coarse
    quantizer trained on the data assigns every vector to its nearest
    centroid's list; a query ranks the centroids by distance, probes
    only the ``nprobe`` nearest lists, and exact-cosine re-ranks the
    candidates inside them.

    The scale path vs brute force: the candidate join is a bucket
    equi-join on the list id (queries side broadcast), so a 10^10-row
    embedding table shuffles nothing and scans nprobe/k_lists of the
    lists per query instead of the full cross product. Unlike LSH's
    data-oblivious hyperplanes, the lists adapt to the data's cluster
    structure (FAISS IndexIVFFlat semantics)."""
    cents = train_ivf_centroids(df, id_col, vec_col, k_lists, iters)
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("norm", _norm(F.col("vec")))
        .withColumn("qv", quantize_fixed_point(F.col("vec")))
    )
    darr = _dist_structs(F.col("qv"), cents)
    listed = base.withColumn(
        "lst", F.array_sort(darr)[0]["i"]
    ).select("id", "vec", "norm", "lst")
    queries = (
        base.filter(F.col("id") < n_queries)
        .withColumn(
            "probed",
            F.slice(
                F.transform(F.array_sort(darr), lambda s: s["i"]),
                1, nprobe,
            ),
        )
        .select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.explode("probed").alias("plst"),
        )
    )
    scored = (
        listed.join(
            F.broadcast(queries),
            (F.col("lst") == F.col("plst"))
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
