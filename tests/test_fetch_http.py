"""S3 real-fetch seam: the batch-HTTP mapInPandas stage driven with a
stub transport (no network in-sandbox). The full round loop runs with
``fetcher=`` installed — fetched bodies parse, links admit, redirects
revert, exactly as with the docs join; parity is against the same
crawl over an equivalent docs table.
"""

import pandas as pd
import pytest

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.fetch_http import (
    make_http_fetcher,
    urllib_transport,
)
from methanol_web_crawler_spark.sources.synthweb import (
    SynthDoc,
    SynthWeb,
)

PAGES = {
    "http://h1.test/a.html": (
        200, "text/html", None,
        '<a href="/b.html">b</a><a href="http://h2.test/c.html">c</a>',
    ),
    "http://h1.test/b.html": (200, "text/html", None, "<p>leaf</p>"),
    "http://h1.test/moved.html": (
        301, None, "http://h1.test/b.html", None,
    ),
}


def make_stub_transport():
    """Nested so cloudpickle ships it BY VALUE to executor workers
    (a module-level function would pickle by reference to this test
    module, which is not importable on the executor python path)."""
    pages = dict(PAGES)

    def stub_transport(url, timeout, max_bytes):
        return pages.get(url, (404, None, None, None))

    return stub_transport


class TestFetchStage:
    def test_stub_fetch_shapes(self, spark):
        fetcher = make_http_fetcher(transport=make_stub_transport())
        urls = spark.createDataFrame(
            [(u,) for u in PAGES] + [("http://h1.test/miss.html",)],
            "url string",
        )
        rows = {r["doc_id"]: r for r in fetcher(urls).collect()}
        ok = rows["http://h1.test/a.html"]
        assert ok["status"] == 200
        assert ok["content_type"] == "text/html"
        assert ok["spans"][0]["kind"] == "text"
        assert 'href="/b.html"' in ok["spans"][0]["text"]
        red = rows["http://h1.test/moved.html"]
        assert red["status"] == 301
        assert red["location"] == "http://h1.test/b.html"
        assert red["spans"] is None
        assert rows["http://h1.test/miss.html"]["status"] == 404

    def test_crawl_with_http_fetcher_matches_docs_join(
        self, spark, tmp_path
    ):
        cfg = default_config()
        seeds = ["http://h1.test/a.html", "http://h1.test/moved.html"]

        fetcher = make_http_fetcher(transport=make_stub_transport())
        c_http = SparkCrawler(
            spark,
            spark.createDataFrame(
                [], "doc_id string, spans array<struct<kind:string,"
                "text:string,media_ref:string,offset:int>>, "
                "content_type string, status int, location string",
            ),
            cfg, politeness_budget=0, fetcher=fetcher,
        )
        s_http = c_http.run(seeds)

        docs = [
            SynthDoc(
                u,
                [("text", body, None, 0)] if body is not None else [],
                ct or "text/html",
                status=st,
                location=loc,
            )
            for u, (st, ct, loc, body) in PAGES.items()
        ]
        c_join = SparkCrawler(
            spark, SynthWeb(docs=docs, seeds=seeds).to_spark(spark),
            cfg, politeness_budget=0,
        )
        s_join = c_join.run(seeds)

        assert s_http.fetched == s_join.fetched
        assert s_http.rounds == s_join.rounds
        seen_http = {
            r["seen_key"]
            for r in c_http._final_seen.select("seen_key").collect()
        }
        seen_join = {
            r["seen_key"]
            for r in c_join._final_seen.select("seen_key").collect()
        }
        assert seen_http == seen_join
        assert "h1.test/b.html" in seen_http
        assert "h2.test/c.html" in seen_http

    def test_default_transport_handles_connect_error(self):
        """The stdlib transport itself: a guaranteed-unroutable URL
        returns the status-0 connect-error shape without raising (no
        packet leaves: .invalid is reserved, resolution fails)."""
        status, ct, loc, body = urllib_transport(
            "http://unresolvable.invalid/x", 1.0, 1024
        )
        assert status == 0 and body is None
