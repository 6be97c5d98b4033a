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
