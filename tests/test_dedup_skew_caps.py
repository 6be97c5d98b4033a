"""Skew caps on the dedup joins: a pathological all-duplicates corpus
must complete with bounded pair counts instead of going quadratic
(the 100 TB posture for minhash_lsh_pairs / ngram_jaccard_pairs)."""

from pyspark.sql import functions as F

from methanol_web_crawler_spark.operators import dedup as dd


def _dup_corpus(spark, n=60):
    """n documents, all with identical text: every LSH band-bucket
    holds all n docs; every token has df = n."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )


def test_lsh_bucket_cap_bounds_pairs(spark):
    docs = _dup_corpus(spark, 60)
    uncapped = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", max_bucket_size=0
    )
    assert uncapped.count() == 60 * 59 // 2  # quadratic without the cap
    capped = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", max_bucket_size=10
    )
    assert capped.count() == 0  # the 60-doc mega-bucket is dropped whole


def test_lsh_cap_keeps_small_buckets(spark):
    # two distinct 3-doc duplicate groups: both under the cap, kept
    a = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("one two three four").alias("text")
    )
    b = spark.range(3, 6).select(
        F.col("id").alias("doc_id"), F.lit("five six seven eight").alias("text")
    )
    pairs = dd.minhash_lsh_pairs(
        a.unionByName(b), "doc_id", "text", max_bucket_size=10
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}


def test_jaccard_hot_token_cap(spark):
    # 70 docs sharing the stopword 'the'; distinct tails. With the cap
    # at 10 the hot token is dropped and no pair survives; without it
    # the sampled pairs (doc%7==0 x doc%5==0) exist via 'the'.
    docs = spark.range(70).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the tail"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    uncapped = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, max_token_df=0
    )
    assert uncapped.count() > 0
    capped = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, max_token_df=10
    )
    assert capped.count() == 0
