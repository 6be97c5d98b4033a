"""friendly/coward single-worker ordering (metha.c:71-79, 957-961):
serial_transfers fetches exactly one URL per round in global sort
order — golden parity engine vs oracle on the full fetch sequence."""

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.synthweb import generate_web


def test_serial_order_golden(spark, tmp_path):
    web = generate_web(n_docs=40, n_hosts=3, seed=7)
    cfg = default_config(robotstxt=True)

    oracle = OracleCrawler(
        web.doc_map, cfg, serial_transfers=True
    ).run(web.seeds)
    # one transfer per round, globally ordered
    assert all(len(rnd) <= 1 for rnd in oracle.rounds)

    engine = SparkCrawler(
        spark, web.to_spark(spark), cfg, serial_transfers=True,
        state_dir=str(tmp_path / "serial"),
    )
    stats = engine.run(web.seeds)
    assert stats.fetched == len(oracle.fetched_urls)

    log = engine.store.table("crawl_log").read_until(spark)
    engine_seq = [
        r["url"]
        for r in log.orderBy("round", "fetch_ord").collect()
    ]
    assert engine_seq == oracle.fetched_urls

    engine_seen = {
        r["seen_key"]
        for r in engine._final_seen.select("seen_key").collect()
    }
    assert engine_seen == oracle.seen


def test_serial_vs_batch_same_seen(spark):
    """Serial order changes ROUND assignment but not the final seen
    set (same admission semantics, same dedup keys)."""
    web = generate_web(n_docs=30, n_hosts=2, seed=9)
    cfg = default_config(robotstxt=True)
    serial = OracleCrawler(
        web.doc_map, cfg, serial_transfers=True
    ).run(web.seeds)
    batch = OracleCrawler(web.doc_map, cfg).run(web.seeds)
    assert serial.seen == batch.seen