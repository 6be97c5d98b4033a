"""Differential tests: the JVM extraction mode (resolver_mode="jvm",
functions/extract_jvm.py + the Python admission stage) must produce
the same candidate multiset as the scalar resolver, and a full crawl
under it must match the pure-Python oracle exactly.
"""

import pandas as pd
import pytest

from pyspark.sql import types as T

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.functions.udfs import (
    CANDIDATE_SCHEMA,
    make_link_admitter,
    make_link_resolver_scalar,
)
from methanol_web_crawler_spark.plans.crawl import build_candidates
from tests.test_resolver_vec_diff import (
    HTML_FAST,
    HTML_SLOW,
    HTML_SPECIAL,
    IN_COLS,
    _page_row,
    _span,
)

IN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host_o", T.IntegerType()),
        T.StructField("host_l", T.IntegerType()),
        T.StructField("file_o", T.IntegerType()),
        T.StructField("ext_o", T.IntegerType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("is_dynamic", T.BooleanType()),
        T.StructField("www", T.BooleanType()),
        T.StructField("seen_key", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("filetype", T.StringType()),
        T.StructField("ft_rank", T.IntegerType()),
        T.StructField("crawler", T.StringType()),
        T.StructField("peek", T.BooleanType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_round", T.IntegerType()),
        T.StructField("parent_ord", T.LongType()),
        T.StructField("sibling_ix", T.IntegerType()),
        T.StructField("redirect_count", T.IntegerType()),
        T.StructField("external", T.BooleanType()),
        T.StructField("fetch_round", T.IntegerType()),
        T.StructField("fetch_ord", T.LongType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("status", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def _cands(spark, rows, mode):
    cfg = default_config()
    pdf = pd.DataFrame(rows, columns=IN_COLS)
    df = spark.createDataFrame(pdf, IN_SCHEMA)
    resolver = make_link_resolver_scalar(cfg, "default")
    admitter = make_link_admitter(cfg, "default")
    out = build_candidates(df, cfg, resolver, admitter, mode)
    cols = sorted(f.name for f in CANDIDATE_SCHEMA.fields)
    return sorted(
        (tuple(r[c] for c in cols) for r in out.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def assert_jvm_matches_scalar(spark, rows):
    a = _cands(spark, rows, "scalar")
    b = _cands(spark, rows, "jvm")
    assert a == b


class TestJvmExtraction:
    def test_fast_and_slow_html(self, spark):
        rows = [
            _page_row("http://h1.example.com/p/x.html", "html",
                      [_span(HTML_FAST)]),
            _page_row("http://h1.example.com/p/y.html", "html",
                      [_span(HTML_SLOW)]),  # guard-fail -> python doc
            _page_row("http://h1.example.com/p/z.html", "html",
                      [_span(HTML_SPECIAL)]),
            _page_row("http://h2.example.com/", "html",
                      [_span(HTML_FAST),
                       _span(kind="media", media_ref="/m/i.jpg")]),
        ]
        assert_jvm_matches_scalar(spark, rows)

    def test_text_chain(self, spark):
        rows = [
            _page_row(
                "http://h1.example.com/t/n.txt", "text",
                [_span("see http://h2.example.com/a.html and "
                       "ftp://f.example.com/d/ plus trailing "
                       "http://h3.example.com/end")],
            ),
            _page_row(
                "http://h1.example.com/t/m.txt", "text",
                [_span("https://skipped.example.com/x "
                       "HTTP://case.example.com/y "
                       "http://ok.example.com/z ")],
            ),
        ]
        assert_jvm_matches_scalar(spark, rows)

    def test_redirects(self, spark):
        rows = [
            _page_row("http://h1.example.com/p/a.html", "html", None,
                      status=301,
                      location="http://h2.example.com/b.html"),
            _page_row("http://h1.example.com/p/c.html", "html", None,
                      status=302, location="/p/rel.html", depth=2,
                      redirect_count=5),
            _page_row("http://h1.example.com/p/d.html", "html", None,
                      status=307, location="loop.html",
                      redirect_count=19),  # cap: dropped
        ]
        assert_jvm_matches_scalar(spark, rows)

    def test_mixed_spans_ordering(self, spark):
        """sibling_ix must follow document order across media + html
        spans exactly as the scalar enumerate does."""
        rows = [
            _page_row(
                "http://h1.example.com/p/x.html", "html",
                [
                    _span('<a href="/first.html">1</a>'),
                    _span(kind="media", media_ref="/mid.png"),
                    _span('<a href="/third.html">3</a>'
                          '<a href="#skip">s</a>'
                          '<a href="/fourth.html">4</a>'),
                ],
            )
        ]
        a = _cands(spark, rows, "scalar")
        b = _cands(spark, rows, "jvm")
        assert a == b
        cols = sorted(f.name for f in CANDIDATE_SCHEMA.fields)
        six_i = cols.index("sibling_ix")
        url_i = cols.index("url")
        order = sorted((r[six_i], r[url_i]) for r in b)
        assert [u for _, u in order] == [
            "http://h1.example.com/first.html",
            "http://h1.example.com/mid.png",
            "http://h1.example.com/third.html",
            "http://h1.example.com/fourth.html",
        ]

    def test_empty_and_parserless(self, spark):
        rows = [
            _page_row("http://h1.example.com/p/x.html", "html", None),
            _page_row("http://h1.example.com/t/n.txt", "text", []),
        ]
        assert_jvm_matches_scalar(spark, rows)


class TestJvmCrawlGolden:
    def test_full_crawl_matches_oracle(self, spark):
        from methanol_web_crawler_spark.oracle.crawler import (
            OracleCrawler,
        )
        from methanol_web_crawler_spark.plans.crawl import SparkCrawler
        from methanol_web_crawler_spark.sources.synthweb import (
            generate_web,
        )

        web = generate_web(n_docs=120, n_hosts=4, seed=42)
        cfg = default_config(robotstxt=True)
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=0,
            resolver_mode="jvm",
        )
        stats = engine.run(web.seeds)
        assert stats.fetched == len(oracle.fetched_urls)
        seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert seen == oracle.seen
