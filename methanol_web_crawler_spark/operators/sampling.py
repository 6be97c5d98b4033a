"""Stratified quota sampling for training-data curation.

Corpus curation needs a per-stratum cap — "at most K documents per
domain/source" — so a handful of giant domains cannot dominate the
training mix (domain balancing). The selection must be DETERMINISTIC
(re-runs and resumes pick the same documents) and UNIFORM within each
stratum (no bias toward early doc ids), which is exactly what ordering
by a cryptographic hash of the id gives: a fixed pseudo-random
permutation per stratum whose first K elements are the sample.

Scale posture (the part that matters at 100 TB): the naive plan — one
``row_number()`` window partitioned by stratum — shuffles EVERY row of
a stratum into one task, so a single hot domain with 10^9 pages turns
into a straggler partition. This is the classic exact two-phase
top-K-per-key instead:

1. salt each row into ``salt_k`` sub-groups of its stratum
   (``xxhash64(id) % salt_k`` — any engine-local hash works, the salt
   never affects the RESULT, only the plan) and take the top-K of
   every ``(stratum, salt)`` sub-group — bounded-size window groups,
   fully parallel;
2. re-rank the surviving ``<= salt_k * K`` candidates per stratum and
   keep the exact top-K.

The union of per-salt top-Ks is a superset of the stratum's global
top-K (every global winner is a winner of its own salt bucket), so
phase 2 returns exactly the single-phase answer — the DuckDB oracle
can therefore be the naive one-window formulation.

md5 is the order key deliberately: Spark and DuckDB produce the same
lowercase-hex digest for the same bytes, making the sampled SET (and
the rank) exactly reproducible cross-engine — unlike
``xxhash64``/``hash``, which are engine-specific (same trick as
``operators/packing.py``).

Reference parity note: the reference engine (a crawler) has no
sampling stage; this operator is part of the training-data pipeline
surface built over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def stratified_quota_sample(
    docs: DataFrame,
    quota: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt_k: int = 16,
) -> DataFrame:
    """At most ``quota`` rows per stratum, picked by the deterministic
    md5-of-id order.

    Returns ``(stratum_col, id_col, sample_rank)`` where
    ``sample_rank`` is the row's 1-based position in its stratum's
    hash order (a stratum smaller than the quota keeps all its rows).
    Exact: identical output to the single-window formulation at any
    ``salt_k``; the salt only bounds per-task group sizes.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    keyed = docs.select(
        F.col(stratum_col),
        F.col(id_col),
        # cast through string so any id type hashes identically to
        # the oracle's md5(CAST(id AS VARCHAR))
        F.md5(F.col(id_col).cast("string").cast("binary")).alias(
            "_ord"
        ),
    )

    # phase 1: per-(stratum, salt) top-K — window groups are
    # ~stratum_size/salt_k rows, so one hot stratum spreads over
    # salt_k tasks instead of one
    salted = keyed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_k))
    )
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy(
        "_ord", id_col
    )
    cand = (
        salted.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= quota)
        .drop("_r", "_salt")
    )

    # phase 2: exact re-rank over <= salt_k * quota rows per stratum
    w2 = Window.partitionBy(stratum_col).orderBy("_ord", id_col)
    return (
        cand.withColumn(
            "sample_rank", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("sample_rank") <= quota)
        .select(stratum_col, id_col, "sample_rank")
    )
