"""JVM admission stage (functions/admit_jvm.py): split coverage and
plan audit on top of the equivalence already pinned by
tests/test_resolver_jvm_diff.py (which runs build_candidates in jvm
mode, i.e. THROUGH split_fast_admit, against the scalar resolver)."""

import pandas as pd
import pytest

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.functions.admit_jvm import (
    _ext_match_map,
    split_fast_admit,
)
from methanol_web_crawler_spark.functions.classify import (
    FtIndex,
    _ext_hash,
)
from methanol_web_crawler_spark.functions.extract_jvm import (
    split_jvm_extractable,
)
from tests.test_resolver_jvm_diff import IN_SCHEMA
from tests.test_resolver_vec_diff import IN_COLS, _page_row, _span

FAST_HREFS = [
    "/p/a.html", "b.html", "x.php?a=1", "sub/", "/q/?s=1",
    "http://h2.example.com/y.html", "HTTPS://H3.EXAMPLE.COM/",
    "ftp://f.example.com/d/", "trail.",
]
RESIDUE_HREFS = [
    "../up.html", "./same.html", "sp ace.html", "x.html#f",
    "x.html?a=1&amp;b=2", "http://h2.example.com:8080/p.html",
    "http:foo", "file:///etc/x", "a//b.html", "unié.html",
]
DROP_HREFS = ["mailto:a@b.c", ":x", "javascript:void(0)"]


def _link_rows(spark, hrefs):
    body = "".join(f'<a href="{h}">t</a>' for h in hrefs)
    rows = [
        _page_row("http://h1.example.com/p/x.html", "html",
                  [_span(body)])
    ]
    pdf = pd.DataFrame(rows, columns=IN_COLS)
    df = spark.createDataFrame(pdf, IN_SCHEMA)
    return split_jvm_extractable(df, default_config())[0]


class TestSplitFastAdmit:
    def test_split_boundary(self, spark):
        cfg = default_config()
        links = _link_rows(
            spark, FAST_HREFS + RESIDUE_HREFS + DROP_HREFS
        )
        fast, residue, _ = split_fast_admit(links, cfg, "default")
        assert fast.count() == len(FAST_HREFS)
        got_residue = {r["href"] for r in residue.collect()}
        assert got_residue == set(RESIDUE_HREFS)

    def test_fast_plan_has_no_python(self, spark):
        """The whole point: fast-shape admission never leaves the JVM."""
        cfg = default_config()
        links = _link_rows(spark, FAST_HREFS)
        fast, _, _ = split_fast_admit(links, cfg, "default")
        plan = fast._jdf.queryExecution().executedPlan().toString()
        for node in ("BatchEvalPython", "ArrowEvalPython",
                     "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan


class TestExtMatchMap:
    def test_matches_bucket_scan_for_all_prefixes(self):
        """The driver-precomputed literal map must agree with the
        16-bucket prefix-compare lookup (ftindex.c:100-133) for every
        candidate ext string AND for non-matching probes."""
        cfg = default_config()
        idx = FtIndex(cfg, cfg.crawlers[0])
        emap = _ext_match_map(idx)

        def by_ext_ref(e):
            if not e:  # match_by_ext's empty guard (classify.py:102)
                return None
            for entry, ft in idx.e_index[_ext_hash(e)]:
                if entry[: len(e)] == e:
                    return ft
            return None

        probes = set(emap) | {
            "", "h", "ht", "htm", "html", "htmlx", "p", "ph", "php",
            "t", "tx", "txt", "txtx", "jsp", "js", "asp", "as", "a",
            "aspx", "xml", "png",
        }
        for e in probes:
            assert emap.get(e) == by_ext_ref(e), e
