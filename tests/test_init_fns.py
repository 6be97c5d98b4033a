"""S2 init functions + shipped JS parser analogs (google.js,
wikipedia.js): unit vectors and a google.conf-driven golden crawl."""

import os

import pytest

from methanol_web_crawler_spark.functions.parsers import (
    google_result_links,
    google_search_init,
    wikipedia_results,
    wikipedia_search_init,
)
from methanol_web_crawler_spark.functions.xmlconv import html_to_xml

REF_CONF = "/root/reference/conf"
have_ref = pytest.mark.skipif(
    not os.path.isdir(REF_CONF), reason="reference conf dir absent"
)


class TestInitFns:
    def test_google_init(self):
        assert google_search_init(["foo", "bar"]) == [
            "http://www.google.com/search?q=foo&start=0",
            "http://www.google.com/search?q=bar&start=0",
        ]

    def test_wikipedia_init(self):
        assert wikipedia_search_init(["cats"]) == [
            "http://en.wikipedia.org/w/index.php?search=cats"
            "&fulltext=Advanced+search"
        ]


class TestResultParsers:
    def test_google_parser_class_l_only(self):
        raw = (
            '<A CLASS="l" HREF="http://r1.example/x">one</A>'
            '<a class="xl" href="http://no.example/">no</a>'
            '<a href="http://no2.example/" class="l">two</a>'
            '<a class="l">no href</a>'
        )
        links = google_result_links(html_to_xml(raw))
        assert links == ["http://r1.example/x", "http://no2.example/"]

    def test_wikipedia_parser(self):
        raw = (
            '<UL CLASS="mw-search-results">'
            '<LI><A TITLE="Cat" HREF="/wiki/Cat">Cat</A></LI>'
            '<LI><A TITLE="Dog" HREF="/wiki/Dog">Dog</A></LI>'
            "</UL>"
            '<ul class="other"><li><a title="No" href="/no">n</a></li></ul>'
        )
        links, attrs = wikipedia_results(html_to_xml(raw))
        assert links == []
        assert attrs == {
            "results": "Cat: http://en.wikipedia.org/wiki/Cat\n"
            "Dog: http://en.wikipedia.org/wiki/Dog"
        }

    def test_wikipedia_no_results_no_attr(self):
        assert wikipedia_results("<p>nothing</p>") == ([], {})


@have_ref
class TestGoogleConfCrawl:
    def test_google_conf_end_to_end(self, spark, tmp_path):
        from methanol_web_crawler_spark.config_loader import load_config
        from methanol_web_crawler_spark.oracle.crawler import (
            OracleCrawler,
        )
        from methanol_web_crawler_spark.plans.crawl import SparkCrawler
        from methanol_web_crawler_spark.sources.synthweb import (
            SynthDoc,
            SynthWeb,
        )

        cfg = load_config(
            os.path.join(REF_CONF, "google.conf"), conf_dirs=(REF_CONF,)
        )
        assert cfg.crawler("default").init == (
            "google.js/google_search_init"
        )

        search_url = "http://www.google.com/search?q=foo&start=0"
        body = (
            '<A CLASS="l" HREF="http://r1.example/hit1">a</A>'
            '<a class="decoy" href="http://no.example/">no</a>'
            '<A CLASS="l" HREF="http://r2.example/hit2">b</A>'
        )
        web = SynthWeb(
            docs=[
                SynthDoc(search_url, [("text", body, None, 0)],
                         "text/html"),
            ],
            seeds=["foo"],  # raw query arg — init composes the URL
        )

        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            state_dir=str(tmp_path / "google"),
        )
        engine.run(web.seeds)

        # init ran: the search URL was fetched
        assert oracle.fetched_urls == [search_url]
        engine_seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert engine_seen == oracle.seen

        want = sorted((t.url, t.filetype) for t in oracle.targets)
        tdf = engine.store.table("targets").read_until(spark)
        got = sorted(
            (r["url"], r["filetype"])
            for r in (tdf.collect() if tdf is not None else [])
        )
        assert got == want
        assert {u for (u, _) in got} == {
            "http://r1.example/hit1", "http://r2.example/hit2",
        }
