"""Golden end-to-end tests: the Spark engine vs the pure-Python oracle.

The verified artifacts per the ordering contract (SURVEY.md §7):
(a) the final seen set — exact;
(b) the per-round fetched URL sequence — exact, ordered;
(c) the targets multiset;
(d) span-sequence invariance for every fetched document (input_hint).
"""

import pytest

from methanol_web_crawler_spark.config import default_config, media_config
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.plans.crawl import SparkCrawler
from methanol_web_crawler_spark.sources.synthweb import generate_web


def run_both(spark, web, cfg, crawler, budget, state_dir=None, **kw):
    oracle = OracleCrawler(
        web.doc_map, cfg, crawler=crawler, politeness_budget=budget
    ).run(web.seeds)
    engine = SparkCrawler(
        spark,
        web.to_spark(spark),
        cfg,
        crawler=crawler,
        politeness_budget=budget,
        state_dir=state_dir,
        **kw,
    )
    stats = engine.run(web.seeds)
    return oracle, engine, stats


def seen_of(engine):
    return {
        r["seen_key"] for r in engine._final_seen.select("seen_key").collect()
    }


def rounds_of(engine, spark):
    log = engine.store.table("crawl_log").read_until(spark)
    rows = log.orderBy("round", "fetch_ord").collect()
    out = {}
    for row in rows:
        out.setdefault(row["round"], []).append(row["url"])
    return out


class TestGoldenDefault:
    @pytest.fixture(scope="class")
    def result(self, spark, tmp_path_factory):
        web = generate_web(n_docs=60, n_hosts=4, seed=101)
        cfg = default_config(robotstxt=True)
        state = str(tmp_path_factory.mktemp("state"))
        return run_both(spark, web, cfg, "default", 3, state_dir=state), spark

    def test_seen_set_exact(self, result):
        (oracle, engine, stats), spark = result
        assert seen_of(engine) == oracle.seen

    def test_round_count(self, result):
        (oracle, engine, stats), spark = result
        assert stats.rounds == len(oracle.rounds)

    def test_per_round_sequences_exact(self, result):
        (oracle, engine, stats), spark = result
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records], f"round {rnd}"

    def test_fetch_totals(self, result):
        (oracle, engine, stats), spark = result
        assert stats.fetched == sum(len(r) for r in oracle.rounds)


class TestGoldenMedia:
    @pytest.fixture(scope="class")
    def result(self, spark, tmp_path_factory):
        web = generate_web(n_docs=80, n_hosts=5, seed=202)
        cfg = media_config(robotstxt=True)
        state = str(tmp_path_factory.mktemp("state"))
        return run_both(spark, web, cfg, "media", 4, state_dir=state), spark

    def test_seen_set_exact(self, result):
        (oracle, engine, stats), spark = result
        assert seen_of(engine) == oracle.seen

    def test_per_round_sequences_exact(self, result):
        (oracle, engine, stats), spark = result
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records], f"round {rnd}"

    def test_targets_match(self, result):
        (oracle, engine, stats), spark = result
        tdf = engine.store.table("targets").read_until(spark)
        got = sorted(
            (r["url"], r["filetype"]) for r in tdf.collect()
        )
        want = sorted((t.url, t.filetype) for t in oracle.targets)
        assert got == want


class TestGoldenUnlimitedBudget:
    def test_no_politeness(self, spark, tmp_path):
        web = generate_web(n_docs=40, n_hosts=3, seed=303)
        cfg = default_config()
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, state_dir=str(tmp_path)
        )
        stats = engine.run(web.seeds)
        assert seen_of(engine) == oracle.seen
        assert stats.rounds == len(oracle.rounds)
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records]


class TestGoldenDepthLimit:
    def test_depth_limit(self, spark, tmp_path):
        web = generate_web(n_docs=50, n_hosts=3, seed=404)
        cfg = default_config(depth_limit=2)
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, state_dir=str(tmp_path)
        )
        stats = engine.run(web.seeds)
        # depth-limit quirk: over-limit URLs are admitted to the seen
        # set but never fetched
        assert seen_of(engine) == oracle.seen
        assert max(
            r.depth for rnd in oracle.rounds for r in rnd
        ) <= 1
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records]


class TestGoldenExternal:
    def test_external_adoption(self, spark, tmp_path):
        web = generate_web(n_docs=60, n_hosts=4, seed=505,
                           cross_host_fraction=0.4)
        cfg = default_config(external=True)
        oracle = OracleCrawler(
            web.doc_map, cfg, politeness_budget=3
        ).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            politeness_budget=3, state_dir=str(tmp_path),
        )
        stats = engine.run(web.seeds)
        assert seen_of(engine) == oracle.seen
        got = rounds_of(engine, spark)
        for rnd, records in enumerate(oracle.rounds):
            assert got.get(rnd, []) == [r.url for r in records], f"round {rnd}"


class TestSpanInvariant:
    def test_span_sequence_equality(self, spark, tmp_path):
        """input_hint per-row invariant: for every fetched doc the
        logged span sequence equals the input (kind, text, media_ref,
        order)."""
        web = generate_web(n_docs=40, n_hosts=3, seed=606)
        cfg = default_config()
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            state_dir=str(tmp_path), log_spans=True,
        )
        engine.run(web.seeds)
        log = engine.store.table("crawl_log").read_until(spark)
        rows = log.select("url", "spans").collect()
        doc_map = web.doc_map
        checked = 0
        for row in rows:
            doc = doc_map.get(row["url"])
            if doc is None:
                continue
            got = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in (row["spans"] or [])
            ]
            want = [(k, t, m, o) for (k, t, m, o) in doc.spans]
            assert got == want, row["url"]
            checked += 1
        assert checked > 0


class TestResume:
    def test_resume_from_checkpoint(self, spark, tmp_path):
        """Kill after round k, resume from the frontier snapshot —
        final state identical to the uninterrupted run."""
        web = generate_web(n_docs=50, n_hosts=3, seed=707)
        cfg = default_config(robotstxt=True)

        full_dir = str(tmp_path / "full")
        engine_full = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            politeness_budget=3, state_dir=full_dir,
        )
        engine_full.run(web.seeds)
        full_seen = seen_of(engine_full)
        full_rounds = rounds_of(engine_full, spark)

        part_dir = str(tmp_path / "part")
        engine_a = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            politeness_budget=3, state_dir=part_dir, max_rounds=2,
        )
        engine_a.run(web.seeds)

        engine_b = SparkCrawler(
            spark, web.to_spark(spark), cfg,
            politeness_budget=3, state_dir=part_dir,
        )
        engine_b.resume()

        assert seen_of(engine_b) == full_seen
        assert rounds_of(engine_b, spark) == full_rounds


class TestSeedGuessing:
    def test_protocol_less_seeds(self, spark, tmp_path):
        """CLI-style seeds without protocol crawl identically in
        oracle and engine (lm_strtourl guessing)."""
        web = generate_web(n_docs=30, n_hosts=2, seed=111)
        bare_seeds = [s.replace("http://", "") for s in web.seeds]
        cfg = default_config()
        oracle = OracleCrawler(web.doc_map, cfg).run(bare_seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, state_dir=str(tmp_path)
        )
        engine.run(bare_seeds)
        assert seen_of(engine) == oracle.seen
        assert len(oracle.fetched_urls) > 5


class TestRedirectLoopCap:
    def test_25_hop_chain_stops_at_20(self, spark):
        """F9 end-to-end: a 25-hop 301 chain; the engine (and oracle)
        revert each Location at the SAME depth (ue_revert,
        urlengine.c:158-165) and drop the row at the 20th redirect
        (worker.c:808) — so exactly hops 0..19 fetch and hop 20
        never enters the frontier."""
        from methanol_web_crawler_spark.config import default_config
        from methanol_web_crawler_spark.oracle.crawler import (
            OracleCrawler,
        )
        from methanol_web_crawler_spark.plans.crawl import SparkCrawler
        from methanol_web_crawler_spark.sources.synthweb import (
            SynthDoc,
            SynthWeb,
        )

        n = 25
        docs = [
            SynthDoc(
                f"http://r.test/hop{i}.html", [], "text/html",
                status=301,
                location=f"http://r.test/hop{i + 1}.html",
            )
            for i in range(n)
        ] + [SynthDoc(f"http://r.test/hop{n}.html",
                      [("text", "end", None, 0)], "text/html")]
        web = SynthWeb(docs=docs, seeds=["http://r.test/hop0.html"])
        cfg = default_config()
        oracle = OracleCrawler(web.doc_map, cfg).run(web.seeds)
        engine = SparkCrawler(
            spark, web.to_spark(spark), cfg, politeness_budget=0,
        )
        stats = engine.run(web.seeds)
        # hops 0..19 fetch (20 fetches), hop20 dropped by the cap
        assert len(oracle.fetched_urls) == 20
        assert stats.fetched == 20
        assert oracle.fetched_urls[-1] == "http://r.test/hop19.html"
        assert not any("hop20" in k for k in oracle.seen)
        seen = {
            r["seen_key"]
            for r in engine._final_seen.select("seen_key").collect()
        }
        assert seen == oracle.seen
