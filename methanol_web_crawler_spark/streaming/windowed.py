"""Watermarked tumbling-window aggregation over an event stream.

The third streaming operator family next to sessions.py (session
windows) and dedup_stream.py (stateful dedup): per-window, per-key
counts and sums with a watermark bounding the aggregation state —
windows older than ``max(ts) - delay`` are finalized and their state
dropped, so a 100 TB / unbounded stream holds only ``delay``-worth of
open windows per key instead of the full history. Events arriving up
to ``delay`` late still merge into their (still-open) window; older
ones are dropped by the watermark — the standard Structured Streaming
late-data contract.

Sums are aggregated in integer cents (floor(value*100 + 0.5) — one
IEEE multiply+add+floor, bit-identical across engines) so the final
totals are order-independent exact int64 arithmetic, hash-comparable
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling ``window`` counts + exact-cents sums per ``key_col``
    with a ``watermark`` on ``ts_col``. Returns the streaming
    aggregate (win struct, key, n, sum_cents); output-mode choice is
    the caller's."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            F.col(key_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).alias("sum_cents"),
        )
    )
