"""End-to-end corpus curation: filter → dedup → sample → pack.

The four training-data stages this package ships individually
(quality scoring, exact dedup, stratified quota sampling, sequence
packing) are what a real pretraining pipeline runs IN SEQUENCE over a
crawled corpus. This operator composes them as one lazy DataFrame
plan so Catalyst sees the whole pipeline — filters push into the
scan, the dedup window and the sample's salted top-K share nothing
but narrow projections between them, and only the final packed
offsets materialize.

Stage plan (and its 100 TB posture):

1. **quality filter** — `quality_features` passthrough + a predicate
   on the rounded score: a narrow projection, no shuffle.
2. **exact dedup** — keep the min-id row per md5(text) group via one
   `row_number` window on the content hash (one shuffle). Duplicate
   groups are content-identical rows, so group sizes stay small; a
   corpus with pathological boilerplate groups should swap in
   `dedup.exact_dedup`'s groupBy (same shuffle key, pre-aggregating
   combiner).
3. **stratified sample** — `stratified_quota_sample` (the exact
   salted two-phase top-K; hot strata spread over salt_k tasks). The
   surviving id set is `quota × |strata|` rows — small by
   construction — so the join that re-attaches document text for
   packing BROADCASTS the sample, costing the big side no shuffle.
4. **pack** — `pack_offsets`' two-phase global prefix-sum (no
   single-partition sort at any scale).

Every stage keeps the md5-derived determinism of its standalone
operator, so the composed DuckDB oracle is the four standalone
oracles chained as CTEs, byte-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.textstats import quality_features
from .packing import pack_offsets
from .sampling import stratified_quota_sample


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    quota: int = 5,
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Returns the packed layout ``(doc, n_tokens, token_offset,
    seq_first, seq_last)`` of the curated corpus: documents scoring
    ``>= min_quality``, content-deduplicated (min id wins), capped at
    ``quota`` per stratum by the deterministic md5 order."""
    scored = quality_features(
        docs, id_col, text_col, extra_cols=(text_col, stratum_col)
    )
    filt = scored.filter(F.col("quality") >= min_quality).select(
        "doc", text_col, stratum_col
    )

    w = Window.partitionBy("_chash").orderBy("doc")
    deduped = (
        filt.withColumn("_chash", F.md5(F.col(text_col).cast("binary")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc", text_col, stratum_col)
    )

    sampled = stratified_quota_sample(
        deduped, quota=quota, stratum_col=stratum_col, id_col="doc"
    )
    # quota x |strata| rows by construction -> broadcast; the corpus
    # side re-attaches text without shuffling
    kept = deduped.join(
        F.broadcast(sampled.select("doc")), "doc", "inner"
    )
    return pack_offsets(kept, seq_len=seq_len, text_col=text_col,
                        id_col="doc")
