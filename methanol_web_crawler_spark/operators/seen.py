"""Partitioned bloom-filter URL-seen set (the mtrie's scale analog).

The reference keeps a per-host compressed trie as an exact in-RAM
membership set (mtrie.c:22-44). At a 10^10-URL frontier the exact set
must live in a table; the bloom layer cuts the per-round anti-join
probe volume: candidates that the filter rejects are *definitely new*
and skip the exact join entirely; only "maybe seen" candidates join
against the seen table (bucket-pruned).

Layout: one bitmap per bucket, bucket = pmod(xxhash64(seen_key), B).
Each bitmap is a numpy-backed bit array of m bits with k probes
derived from the 64-bit key hash by double hashing
(pos_i = (h1 + i*h2) mod m). Updates run distributed: the round's new
keys group by bucket and a cogrouped applyInPandas merges them into
the stored bitmaps — no driver-side state, so the filter scales with
the bucket count, not the driver heap.

False positives only ever *add* rows to the exact join (correctness
is preserved); false negatives are impossible for inserted keys.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("bitmap", T.BinaryType()),
    ]
)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per hash, double hashing, vectorized.
    Returns an array of shape (len(hashes), k)."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bitmap, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k bits are set (maybe-seen)."""
    flat = pos.reshape(-1)
    bits = (bitmap[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
    return bits.reshape(pos.shape).all(axis=1)


class BloomSeenFilter:
    """Distributed, bucket-partitioned bloom filter over key hashes.

    State is a (bucket, bitmap) DataFrame; ``update`` merges a round's
    new key hashes, ``split`` partitions candidates into
    (definitely_new, maybe_seen).
    """

    def __init__(
        self,
        spark: SparkSession,
        n_buckets: int = 64,
        m_bits: int = 1 << 20,  # 128 KiB per bucket
        k: int = 5,
    ):
        self.spark = spark
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k
        self.state: DataFrame = spark.createDataFrame([], BLOOM_SCHEMA)

    @classmethod
    def sized_for(
        cls,
        spark: SparkSession,
        expected_keys: int,
        fp_rate: float = 0.01,
        n_buckets: int = 64,
    ) -> "BloomSeenFilter":
        """Size the filter from the EXPECTED FRONTIER, not a constant:
        per-bucket m = -n/B * ln(p) / ln(2)^2 (~9.6 bits/key at 1%),
        rounded up to a power of two (cheap modulo, byte-aligned);
        k = m*B/n * ln(2) (~7 probes at 1%). A static 1 MiB bitmap at
        a 10^10-key frontier would saturate and approve everything —
        the filter's value IS its sizing."""
        import math

        n = max(1, expected_keys)
        per_bucket = max(1, n // max(1, n_buckets))
        m_exact = -per_bucket * math.log(fp_rate) / (math.log(2) ** 2)
        m_bits = 1 << max(13, math.ceil(math.log2(m_exact)))
        k = max(1, round(m_bits / per_bucket * math.log(2)))
        return cls(spark, n_buckets=n_buckets, m_bits=m_bits, k=min(k, 16))

    # -- helpers ---------------------------------------------------------

    def _bucket_col(self, hash_col) -> "F.Column":
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")

    # -- update ----------------------------------------------------------

    def update(self, new_keys: DataFrame, hash_col: str = "key_hash") -> None:
        """Merge new key hashes into the bitmaps (distributed cogroup)."""
        m_bits, k = self.m_bits, self.k
        empty = bytes(m_bits >> 3)

        def merge(
            state_pdf: pd.DataFrame, keys_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            if len(keys_pdf) == 0 and len(state_pdf) == 0:
                return pd.DataFrame({"bucket": [], "bitmap": []})
            bucket = int(
                keys_pdf["bucket"].iloc[0]
                if len(keys_pdf)
                else state_pdf["bucket"].iloc[0]
            )
            if len(state_pdf):
                bitmap = np.frombuffer(
                    state_pdf["bitmap"].iloc[0], dtype=np.uint8
                ).copy()
            else:
                bitmap = np.frombuffer(empty, dtype=np.uint8).copy()
            if len(keys_pdf):
                pos = _positions(
                    keys_pdf["h"].to_numpy(), m_bits, k
                )
                _set_bits(bitmap, pos)
            return pd.DataFrame(
                {"bucket": [bucket], "bitmap": [bitmap.tobytes()]}
            )

        keys = new_keys.select(
            self._bucket_col(F.col(hash_col)).alias("bucket"),
            F.col(hash_col).alias("h"),
        )
        self.state = (
            self.state.groupBy("bucket")
            .cogroup(keys.groupBy("bucket"))
            .applyInPandas(merge, BLOOM_SCHEMA)
            .localCheckpoint()
        )

    # -- query -----------------------------------------------------------

    def split(
        self, candidates: DataFrame, hash_col: str = "key_hash",
        materialize: bool = False,
    ) -> Tuple[DataFrame, DataFrame]:
        """(definitely_new, maybe_seen). Cogroups candidates with their
        bucket's bitmap (the same shape as ``update``): one bitmap per
        task, NOT one bitmap copy per candidate row — a bitmap-join
        would push rows x m_bits/8 duplicated bytes through every Arrow
        batch (128 KiB x 10k rows ~ 1.2 GB per batch).

        ``materialize=True`` localCheckpoints the probed frame so the
        two returned branches read ONE Python cogroup pass instead of
        re-running the probe (and everything upstream) each — the
        right call when both halves are consumed eagerly and upstream
        is a plain scan; leave False when a caller manages caching
        itself or consumes only one branch."""
        m_bits, k = self.m_bits, self.k
        out_fields = [f.name for f in candidates.schema.fields]
        result_schema = T.StructType(
            candidates.schema.fields
            + [T.StructField("__maybe", T.BooleanType())]
        )
        with_bucket = candidates.withColumn(
            "__bucket", self._bucket_col(F.col(hash_col))
        )

        def probe(
            cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            out = cand_pdf[out_fields].copy()
            if len(cand_pdf) == 0:
                out["__maybe"] = pd.Series([], dtype=bool)
                return out
            bm = (
                state_pdf["bitmap"].iloc[0] if len(state_pdf) else None
            )
            if bm is None:
                out["__maybe"] = False  # no bitmap yet -> definitely new
                return out
            bitmap = np.frombuffer(bytes(bm), dtype=np.uint8)
            pos = _positions(cand_pdf[hash_col].to_numpy(), m_bits, k)
            out["__maybe"] = _test_bits(bitmap, pos)
            return out

        probed = (
            with_bucket.groupBy("__bucket")
            .cogroup(
                self.state.withColumnRenamed("bucket", "__bucket")
                .groupBy("__bucket")
            )
            .applyInPandas(probe, result_schema)
        )
        if materialize:
            probed = probed.localCheckpoint()
        return (
            probed.filter(~F.col("__maybe")).drop("__maybe"),
            probed.filter(F.col("__maybe")).drop("__maybe"),
        )


