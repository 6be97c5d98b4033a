"""Golden parity with the bloom prefilter and salted politeness on —
both are pure optimizations and must not change any output."""

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.synthweb import generate_web


def seen_of(engine):
    return {
        r["seen_key"]
        for r in engine._final_seen.select("seen_key").collect()
    }


def rounds_of(engine, spark):
    log = engine.store.table("crawl_log").read_until(spark)
    rows = log.orderBy("round", "fetch_ord").collect()
    out = {}
    for row in rows:
        out.setdefault(row["round"], []).append(row["url"])
    return out


class TestBloomParity:
    def test_bloom_crawl_matches_oracle(self, spark, tmp_path):
        web = generate_web(n_docs=50, n_hosts=3, seed=808)
        cfg = default_config(robotstxt=True)
        oracle = OracleCrawler(
            web.doc_map, cfg, politeness_budget=3
        ).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=3,
            state_dir=str(tmp_path), bloom_buckets=8,
            bloom_bits=1 << 16,
        )
        stats = engine.run(web.seeds)
        assert seen_of(engine) == oracle.seen
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records], rnd


class TestSaltedPolitenessParity:
    def test_salted_matches_plain(self, spark, tmp_path):
        web = generate_web(n_docs=60, n_hosts=3, seed=909)
        cfg = default_config(robotstxt=True)
        oracle = OracleCrawler(
            web.doc_map, cfg, politeness_budget=2
        ).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=2,
            state_dir=str(tmp_path), salt_k=4,
        )
        engine.run(web.seeds)
        assert seen_of(engine) == oracle.seen
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records], rnd


class TestRunFrontierBloomParity:
    def test_run_frontier_seeds_the_bloom(self, spark):
        """run_frontier must seed the bloom with the initial seen set:
        without it every frontier key bypasses the exact anti-join as
        'definitely new' and the seen total inflates (regression for
        the round-3 --bloom-diag checksum catch)."""
        from methanol_web_crawler_spark.config import default_config
        from methanol_web_crawler_spark.functions.canonicalize import (
            parse_url,
        )
        from methanol_web_crawler_spark.plans.crawl import (
            FRONTIER_SCHEMA,
            SparkCrawler,
        )
        from methanol_web_crawler_spark.sources.synthweb import (
            generate_web,
        )

        web = generate_web(n_docs=80, n_hosts=4, seed=7)
        cfg = default_config()

        def frontier_rows():
            rows = []
            for i, d in enumerate(web.docs):
                p = parse_url(d.doc_id)
                if p is None:
                    continue
                rows.append(
                    (
                        p.url, p.host_o, p.host_l, p.file_o, p.ext_o,
                        p.protocol, p.is_dynamic, p.www_prefix,
                        p.seen_key, p.host_identity, "html", 0,
                        "default", False, 0, -1, -1, i, 0, False,
                    )
                )
            return spark.createDataFrame(rows, FRONTIER_SCHEMA)

        stats = {}
        for name, buckets in (("plain", 0), ("bloom", 8)):
            c = SparkCrawler(
                spark, web.to_spark(spark), cfg,
                politeness_budget=0, collect_metrics=False,
                max_rounds=1, bloom_buckets=buckets,
                bloom_expected_keys=1000 if buckets else None,
            )
            stats[name] = c.run_frontier(frontier_rows())
        assert stats["bloom"].seen == stats["plain"].seen
        assert stats["bloom"].fetched == stats["plain"].fetched
