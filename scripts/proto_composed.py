#!/usr/bin/env python
"""Prototype the epeek+jail+switch composed crawl; print the oracle's
fetch log + targets as golden VALUES rows."""
import sys

sys.path.insert(0, "/root/repo")

from methanol_web_crawler_spark.config import (
    CrawlConfig, Crawler, Filetype,
)
from methanol_web_crawler_spark.oracle.crawler import OracleCrawler
from methanol_web_crawler_spark.sources.synthweb import SynthDoc, SynthWeb


def html_doc(url, hrefs, ct="text/html"):
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return SynthDoc(url, [("text", body, None, 0)], ct)


def composed_config():
    html = Filetype(
        name="html", extensions=("html",),
        mimetypes=("text/html",), parsers=("html",),
    )
    gateway = Filetype(
        name="gateway", extensions=("gw",),
        parsers=("html",), switch_to="inner",
    )
    image = Filetype(name="image", extensions=("png",))
    outer = Crawler(
        name="outer", filetypes=("html", "gateway"),
        jail=True, external_peek=True, peek_limit=2,
        dynamic_url="discard", extless_url="discard",
        dir_url="@html", unknown_url="discard",
    )
    inner = Crawler(
        name="inner", filetypes=("html", "image"),
        depth_limit=3,
        dynamic_url="discard", extless_url="discard",
        dir_url="@html", unknown_url="discard",
    )
    cfg = CrawlConfig(
        filetypes=(html, gateway, image), crawlers=(outer, inner)
    )
    cfg.validate()
    return cfg


def composed_web():
    docs = [
        # seed dir /sub -> the outer crawl's jail
        html_doc("http://a.test/sub/index.html", [
            "inside.html",              # jail-ok
            "/other/out.html",          # out of jail: seen, not fetched
            "gate.gw",                  # switch_to inner
            "http://b.test/p/peek0.html",  # external -> starts a peek
            "/sub/deep/two.html",       # deeper dir under the jail
        ]),
        html_doc("http://a.test/sub/inside.html", []),
        html_doc("http://a.test/other/out.html", ["esc.html"]),
        html_doc("http://a.test/sub/deep/two.html", []),
        # the gateway: children classified under 'inner' (no jail)
        html_doc("http://a.test/sub/gate.gw", [
            "in1.html", "pic1.png",
            "/other/free.html",        # inner is NOT jailed: fetched
        ]),
        html_doc("http://a.test/sub/in1.html", ["pic2.png", "in2.html"]),
        html_doc("http://a.test/sub/in2.html", []),
        html_doc("http://a.test/other/free.html", []),
        # the b.test peek chain under /p (jail registered at peek0's dir)
        html_doc("http://b.test/p/peek0.html", [
            "http://b.test/p/peek1.html",  # abs same-host: peek continues
            "rel.html",                 # QUIRK: inherits EXTERNAL -> drop
            "http://b.test/q/esc2.html",   # abs but out of the peek jail
            "http://a.test/sub/back.html",  # external during peek: no nest
        ]),
        html_doc("http://b.test/p/peek1.html",
                 ["http://b.test/p/peek2.html"]),  # depth 2 >= limit
        html_doc("http://b.test/p/peek2.html", []),
        html_doc("http://b.test/p/rel.html", []),
        html_doc("http://b.test/q/esc2.html", []),
        html_doc("http://a.test/sub/back.html", []),
    ]
    return SynthWeb(docs=docs, seeds=["http://a.test/sub/index.html"])


if __name__ == "__main__":
    web = composed_web()
    cfg = composed_config()
    res = OracleCrawler(web.doc_map, cfg, crawler="outer").run(web.seeds)
    print("-- fetch log (round, depth, url):")
    for i, u in enumerate(res.fetched_urls):
        print("   ", u)
    if hasattr(res, "per_round"):
        print("per_round:", res.per_round)
    print("-- log with rounds:")
    for m in res.log:
        print("   ", m)
    print("-- targets:")
    for t in sorted(res.targets, key=lambda t: t.url):
        print("   ", t.url, t.filetype)
    print("-- seen:", len(res.seen))
    for k in sorted(res.seen):
        print("   ", k)
