"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``methanol_web_crawler_spark.entryqueries``;
operator inventory mapping in SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from methanol_web_crawler_spark import entryqueries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: an end-to-end crawl of the deterministic synthetic
    web at sf0.001 scale — returns per-round crawl metrics."""
    return entryqueries.crawl_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data pipeline operators (dedup / similarity / text
    analysis / multimodal)."""
    return dict(entryqueries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query — every query has an oracle:
    deterministic crawls (crawl_flagship, crawl_writefile) use
    literal golden VALUES derived from the pure-Python oracle,
    ann_lsh_topk reproduces its sin-hyperplane buckets in SQL."""
    return dict(entryqueries.ORACLES)
