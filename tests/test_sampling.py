"""Stratified quota sampling vs a pure-Python md5 oracle.

Covers the two shapes that matter: a skewed stratum (much larger than
the quota — the case the salted two-phase plan exists for) and an
under-quota stratum (kept whole). Also pins the salt-invariance
contract: salt_k changes the plan, never the rows.
"""

import hashlib

import pytest


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def _oracle(rows, quota):
    """rows = [(stratum, id)] -> {(stratum, id, rank)} by md5 order."""
    by_stratum = {}
    for s, i in rows:
        by_stratum.setdefault(s, []).append(i)
    out = set()
    for s, ids in by_stratum.items():
        ids.sort(key=lambda i: (_md5(i), i))
        for rank, i in enumerate(ids[:quota], start=1):
            out.add((s, i, rank))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed: 'big' has 200 rows, 'mid' 10, 'tiny' 2 (under quota)
    rows = (
        [("big", i) for i in range(200)]
        + [("mid", 1000 + i) for i in range(10)]
        + [("tiny", 2000), ("tiny", 2001)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    return rows, df.repartition(7)


def test_matches_md5_oracle(spark, corpus):
    from methanol_web_crawler_spark.operators.sampling import (
        stratified_quota_sample,
    )

    rows, df = corpus
    got = {
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in stratified_quota_sample(df, quota=5).collect()
    }
    assert got == _oracle(rows, 5)
    # under-quota stratum kept whole, skewed stratum capped
    assert sum(1 for s, _, _ in got if s == "tiny") == 2
    assert sum(1 for s, _, _ in got if s == "big") == 5


def test_salt_invariance(spark, corpus):
    from methanol_web_crawler_spark.operators.sampling import (
        stratified_quota_sample,
    )

    _, df = corpus
    a = {
        tuple(r)
        for r in stratified_quota_sample(df, 3, salt_k=1).collect()
    }
    b = {
        tuple(r)
        for r in stratified_quota_sample(df, 3, salt_k=16).collect()
    }
    c = {
        tuple(r)
        for r in stratified_quota_sample(df, 3, salt_k=5).collect()
    }
    assert a == b == c


def test_quota_validation(spark, corpus):
    from methanol_web_crawler_spark.operators.sampling import (
        stratified_quota_sample,
    )

    _, df = corpus
    with pytest.raises(ValueError):
        stratified_quota_sample(df, 0)
