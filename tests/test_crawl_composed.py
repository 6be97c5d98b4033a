"""Engine parity for the composed epeek+jail+switch flagship variant
(driver entry crawl_composed_epeek_jail_switch)."""

from methanol_web_crawler_spark.entryqueries import (
    composed_config,
    composed_web,
    crawl_composed_epeek_jail_switch,
)
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler


class TestComposedCrawl:
    def test_oracle_composition(self):
        web = composed_web()
        res = OracleCrawler(
            web.doc_map, composed_config(), crawler="outer"
        ).run(web.seeds)
        fetched = set(res.fetched_urls)
        # jail blocks /other for the OUTER crawler ...
        assert "http://a.test/other/out.html" not in fetched
        assert any("out.html" in k for k in res.seen)
        # ... but not for the un-jailed inner crawler
        assert "http://a.test/other/free.html" in fetched
        # peek chain budget + its own jail
        assert "http://b.test/p/peek1.html" in fetched
        assert "http://b.test/p/peek2.html" not in fetched
        assert "http://b.test/q/esc2.html" not in fetched
        # relative link on a peeked page inherits EXTERNAL -> seen
        # (dedup precedes classification) but never fetched
        assert "http://b.test/p/rel.html" not in fetched
        assert any("rel.html" in k for k in res.seen)
        # no peek nesting back to a.test
        assert "http://a.test/sub/back.html" not in fetched
        # switch: images are targets only under inner
        t_urls = {t.url for t in res.targets}
        assert t_urls == {
            "http://a.test/sub/pic1.png",
            "http://a.test/sub/pic2.png",
        }
        # inner's depth_limit=3 leaves in2 seen-but-unfetched
        assert "http://a.test/sub/in2.html" not in fetched
        assert any("in2" in k for k in res.seen)

    def test_engine_matches_golden(self, spark):
        web = composed_web()
        cfg = composed_config()
        oracle = OracleCrawler(
            web.doc_map, cfg, crawler="outer"
        ).run(web.seeds)
        df = crawl_composed_epeek_jail_switch(spark, "unused")
        got_fetch = [
            (r["round"], r["depth"], r["url"])
            for r in df.filter("kind = 'fetch'")
            .orderBy("round", "url").collect()
        ]
        want_fetch = sorted(
            (ri, rec.depth, rec.url)
            for ri, rnd in enumerate(oracle.rounds)
            for rec in rnd
        )
        assert got_fetch == want_fetch
        got_targets = sorted(
            r["url"] for r in df.filter("kind = 'target'").collect()
        )
        assert got_targets == sorted(t.url for t in oracle.targets)
