"""S9 writefile handler: naming quirks, cross-round dedup suffixes,
files sink parity engine vs oracle, and the parse-buffer swap."""

import pytest

from methanol_web_crawler_spark.config import CrawlConfig, Crawler, Filetype
from methanol_web_crawler_spark.functions.canonicalize import parse_url
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.synthweb import SynthDoc, SynthWeb


def writefile_config() -> CrawlConfig:
    html = Filetype(
        name="html",
        extensions=("htm", "html", "php"),
        mimetypes=("text/html",),
        parsers=("html",),
        handler="writefile",
    )
    cfg = CrawlConfig(
        filetypes=(html,),
        crawlers=(
            Crawler(
                name="default", filetypes=("html",),
                dynamic_url="@html", extless_url="@html",
                dir_url="@html", unknown_url="discard",
            ),
        ),
    )
    cfg.validate()
    return cfg


def _doc(url, hrefs):
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return SynthDoc(url, [("text", body, None, 0)], "text/html")


@pytest.fixture(scope="module")
def web():
    """The buffer swap means a writefile crawl expands only through
    seeds and redirects (parsed buffers are filenames, no hrefs) — so
    collisions come from a wide seed list plus a redirect chain that
    lands a colliding basename in a LATER round."""
    h1, h2 = "http://w1.test", "http://w2.test"
    docs = [
        _doc(f"{h1}/", [f"{h1}/never-parsed.html"]),
        _doc(f"{h1}/page.html", [f"{h1}/deep.html"]),
        _doc(f"{h1}/a/page.html", []),
        _doc(f"{h1}/item.php?id=3", []),
        _doc(f"{h2}/", []),
        _doc(f"{h2}/page.html", []),
        # redirect chain: fetched in round 0, target lands round 1
        # and collides with the round-0 page.html saves
        SynthDoc(f"{h2}/r.html", [], "text/html", status=301,
                 location=f"{h2}/b/page.html"),
        _doc(f"{h2}/b/page.html", []),
    ]
    seeds = [
        f"{h1}/", f"{h1}/page.html", f"{h1}/a/page.html",
        f"{h1}/item.php?id=3", f"{h2}/", f"{h2}/page.html",
        f"{h2}/r.html",
    ]
    return SynthWeb(docs=docs, seeds=seeds)


class TestNaming:
    def test_name_cases(self):
        o = OracleCrawler({}, writefile_config())
        o._name_counts = {}
        cases = [
            ("http://x.test/page.html", "page.html"),
            ("http://x.test/page.html", "page-1.html"),
            ("http://x.test/a/page.html", "page-2.html"),
            ("http://x.test/", "index.html"),
            ("http://x.test/sub/", "index-1.html"),
            ("http://x.test/item.php?id=3", "item.php"),
            ("http://x.test/item.php?id=4", "item-1.php"),
            ("http://x.test/noext", "noext"),
            ("http://x.test/noext?q=1", "noext-1"),
        ]
        for url, want in cases:
            p = parse_url(url)
            assert o._writefile_name(p) == want, url


class TestGoldenWritefile:
    def test_files_sink_parity(self, spark, tmp_path, web):
        cfg = writefile_config()
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            state_dir=str(tmp_path / "wf"),
        )
        stats = engine.run(web.seeds)

        want = sorted(
            (f.url, f.filetype, f.filename, f.body)
            for f in oracle.files
        )
        fdf = engine.store.table("files").read_until(spark)
        got = sorted(
            (r["url"], r["filetype"], r["filename"], r["body"])
            for r in (fdf.collect() if fdf is not None else [])
        )
        assert got == want
        # all 7 seeds fetched; the redirect row saves nothing itself
        # but its target (b/page.html) is fetched in round 1 and gets
        # the next collision suffix
        fnames = sorted(f for (_, _, f, _) in got)
        assert fnames == sorted([
            "index.html", "index-1.html", "page.html", "page-1.html",
            "page-2.html", "page-3.html", "item.php",
        ])

        # parse-buffer swap: the chain parses FILENAMES (no hrefs),
        # so body links (never-parsed.html, deep.html) are never seen
        engine_seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert engine_seen == oracle.seen
        assert not any("deep" in k or "never-parsed" in k
                       for k in oracle.seen)

    def test_resume_restores_name_counts(self, spark, tmp_path, web):
        cfg = writefile_config()
        sd = str(tmp_path / "wf_resume")
        eng1 = SparkCrawler(
            spark, web.to_spark(spark), cfg, state_dir=sd, max_rounds=1
        )
        eng1.run(web.seeds)
        eng2 = SparkCrawler(
            spark, web.to_spark(spark), cfg, state_dir=sd
        )
        eng2.resume()
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        want = sorted(
            (f.url, f.filename) for f in oracle.files
        )
        fdf = eng2.store.table("files").read_until(spark)
        got = sorted(
            (r["url"], r["filename"]) for r in fdf.collect()
        )
        assert got == want
