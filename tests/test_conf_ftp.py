"""S6 FTP source end-to-end: crawl the reference's own ftp.conf
(ftp_dir_url = "@ftp", filetype "ftp" with the ftp LIST parser) over a
synthetic FTP tree whose docs carry ``kind='ftplist'`` spans — the
SURVEY §2.1 S6 representation. Engine (SparkCrawler) must match the
pure-Python oracle exactly: directories re-enter with a trailing '/'
(ftpparse flagtrycwd, builtin.c:207-244), plain files match by
extension only (ftindex.c:146-153 — no fallback bindings for ftp), and
symlinks are cwd candidates.
"""

import os

import pytest

from methanol_web_crawler_spark.config import CrawlConfig
from methanol_web_crawler_spark.config_loader import load_config
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.synthweb import (
    generate_ftp_web as ftp_web,
)

REF_CONF = "/root/reference/conf"


def _unlimited(cfg: CrawlConfig) -> CrawlConfig:
    """ftp.conf leaves the reference default depth_limit=1
    (crawler.c:47) — seed listings only. The tree variant lifts it."""
    import dataclasses

    crs = tuple(
        dataclasses.replace(c, depth_limit=0) for c in cfg.crawlers
    )
    out = CrawlConfig(filetypes=cfg.filetypes, crawlers=crs)
    out.validate()
    return out


@pytest.fixture(scope="module")
def ftp_cfg():
    return load_config(
        os.path.join(REF_CONF, "ftp.conf"), conf_dirs=(REF_CONF,)
    )


class TestFtpConfLoads:
    def test_bindings(self, ftp_cfg):
        cr = ftp_cfg.crawler("default")
        assert cr.ftp_dir_url == "@ftp"
        ft = ftp_cfg.filetype("ftp")
        assert ft.parsers == ("ftp",)
        assert cr.depth_limit == 1  # reference default survives


class TestFtpCrawl:
    def _run_both(self, spark, cfg):
        web = ftp_web()
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=0
        )
        stats = engine.run(web.seeds)
        return web, oracle, engine, stats

    def test_verbatim_conf_depth1(self, spark, ftp_cfg):
        """ftp.conf as shipped: depth_limit=1 -> only seed listings
        fetch; their dir children enter the seen set but never fetch."""
        web, oracle, engine, stats = self._run_both(spark, ftp_cfg)
        assert stats.fetched == len(oracle.fetched_urls) == 2
        engine_seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert engine_seen == oracle.seen

    def test_full_tree(self, spark, ftp_cfg):
        """depth_limit=0 variant: the whole directory tree fetches;
        files are discarded by extension-only ftp classification."""
        cfg = _unlimited(ftp_cfg)
        web, oracle, engine, stats = self._run_both(spark, cfg)
        assert stats.fetched == len(oracle.fetched_urls)
        # every directory URL (and only directories) was fetched
        want = {
            "ftp://f01.test/", "ftp://f01.test/pub/",
            "ftp://f01.test/pub/data/", "ftp://f01.test/src/",
            "ftp://f01.test/src/v2/", "ftp://f01.test/latest/",
            "ftp://f02.test/", "ftp://f02.test/mirror/",
        }
        assert set(oracle.fetched_urls) == want
        engine_seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert engine_seen == oracle.seen
        # files entered the seen set (admitted) but never fetched
        assert "f01.test/readme.txt" in engine_seen
        assert "f01.test/pub/notes.txt" in engine_seen
