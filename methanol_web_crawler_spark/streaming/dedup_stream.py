"""Streaming URL dedup — a custom stateful operator.

``applyInPandasWithState`` keyed by host bucket: each micro-batch of
candidate URLs is checked against per-group persistent state (the set
of seen key-hashes for that bucket) and only first-seen URLs are
emitted. This is the Structured Streaming twin of the batch engine's
seen anti-join — the shape a continuous crawl ingestion pipeline
needs (frontier updates arriving as a stream).

State is the per-bucket hash set encoded as a binary blob (int64
array) — the same bucketing as the batch bloom filter
(operators/seen.py), so the two representations interconvert.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("key_hash", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("hashes", T.BinaryType())]
)


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (blob,) = state.get
        seen = np.frombuffer(blob, dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)

    seen_set = set(seen.tolist())
    out_urls, out_hashes = [], []
    for pdf in pdfs:
        for url, h in zip(pdf["url"], pdf["key_hash"]):
            h = int(h)
            if h not in seen_set:
                seen_set.add(h)
                out_urls.append(url)
                out_hashes.append(h)
    state.update((np.array(sorted(seen_set), dtype=np.int64).tobytes(),))
    yield pd.DataFrame(
        {
            "bucket": [key[0]] * len(out_urls),
            "url": out_urls,
            "key_hash": out_hashes,
        }
    )


def streaming_dedup(
    urls: DataFrame, n_buckets: int = 16
) -> DataFrame:
    """First-seen URLs from a streaming DataFrame with a ``url``
    column; state partitioned by hash bucket (update output mode)."""
    keyed = urls.select(
        "url", F.xxhash64(F.lower(F.col("url"))).alias("key_hash")
    ).withColumn(
        "bucket", F.pmod(F.col("key_hash"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
