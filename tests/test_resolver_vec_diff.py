"""Differential fuzz: the vectorized resolver (resolve_vec.py) must
produce the SAME candidate multiset as the scalar reference resolver
(udfs.make_link_resolver_scalar) on every input batch — fast shapes and
residue shapes alike. The scalar resolver is the semantics spec (it is
itself pinned against the reference engine by the golden crawls and the
hand-derived unit vectors); the vectorized twin must never diverge.

No SparkSession needed: both are mapInPandas bodies, driven directly on
pandas frames here.
"""

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from methanol_web_crawler_spark.config import default_config
from methanol_web_crawler_spark.functions.canonicalize import parse_url
from methanol_web_crawler_spark.functions.classify import FtIndex
from methanol_web_crawler_spark.functions.resolve_vec import (
    _classify_key,
    has_umex,
    make_link_resolver_vec,
)
from methanol_web_crawler_spark.functions.udfs import (
    CANDIDATE_SCHEMA,
    make_link_resolver_scalar,
)

COLS = [f.name for f in CANDIDATE_SCHEMA.fields]

IN_COLS = [
    "url", "host_o", "host_l", "file_o", "ext_o", "protocol",
    "is_dynamic", "www", "seen_key", "host", "filetype", "ft_rank",
    "crawler", "peek", "depth", "parent_round", "parent_ord",
    "sibling_ix", "redirect_count", "external", "fetch_round",
    "fetch_ord", "spans", "status", "location", "content_type",
]


def _page_row(url, filetype, spans, status=200, location=None,
              depth=0, redirect_count=0, external=False, crawler=None,
              peek=False, fetch_round=0, fetch_ord=0):
    p = parse_url(url)
    assert p is not None, url
    return {
        "url": p.url, "host_o": p.host_o, "host_l": p.host_l,
        "file_o": p.file_o, "ext_o": p.ext_o, "protocol": p.protocol,
        "is_dynamic": p.is_dynamic, "www": p.www_prefix,
        "seen_key": p.seen_key, "host": p.host_identity,
        "filetype": filetype, "ft_rank": 0,
        "crawler": crawler, "peek": peek, "depth": depth,
        "parent_round": 0, "parent_ord": 0, "sibling_ix": 0,
        "redirect_count": redirect_count, "external": external,
        "fetch_round": fetch_round, "fetch_ord": fetch_ord,
        "spans": spans, "status": status, "location": location,
        "content_type": "text/html",
    }


def _span(text=None, kind="text", media_ref=None):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": 0}


def _run(maker, cfg, pdf, default_crawler="default"):
    out = list(maker(cfg, default_crawler)(iter([pdf])))
    frames = [f for f in out if len(f)]
    if not frames:
        return pd.DataFrame(columns=COLS)
    res = pd.concat(frames, ignore_index=True)[COLS]
    return res


def _canon(df):
    """Order-insensitive, NaN/None-insensitive row multiset."""
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, (bool,)):
                vals.append(bool(v))
            elif isinstance(v, float) and v == int(v):
                vals.append(int(v))
            elif hasattr(v, "item"):  # numpy scalar
                vals.append(v.item())
            else:
                vals.append(v)
        rows.append(tuple(vals))
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def assert_equivalent(cfg, rows, default_crawler="default"):
    pdf = pd.DataFrame(rows, columns=IN_COLS)
    a = _canon(_run(make_link_resolver_scalar, cfg, pdf,
                    default_crawler))
    b = _canon(_run(make_link_resolver_vec, cfg, pdf, default_crawler))
    assert a == b


# -- hand-picked shapes -------------------------------------------------------

HTML_FAST = (
    '<p>hello</p><a href="http://h1.example.com/p/a.html">x</a>'
    '<a href="/q/view.php?id=3">y</a>'
    '<a href="sub/page.html">z</a>'
    '<img src="http://www.h1.example.com/i.png"/>'
)
HTML_SLOW = (
    "<a href='single-quoted.html'>q</a>"
    '<a disabled href="missed.html">bare-attr quirk</a>'
    '<A HREF="UPPER.HTML">u</A>'
    '<a href="../up/../twice.html">dots</a>'
    '<a href="#frag">skip</a>'
    '<a href="mailto:x@y.z">drop</a>'
    '<a href="spa ce.html">enc</a>'
)
HTML_SPECIAL = (
    '<style>.x { background: url(css-target.png); }</style>'
    '<script>var x = "<a href=\'no.html\'>";</script>'
    '<a href="after-special.html">ok</a>'
)


def test_fast_html_batch():
    cfg = default_config()
    rows = [
        _page_row("http://h1.example.com/p/x.html", "html",
                  [_span(HTML_FAST)]),
        _page_row("http://h2.example.com/", "html",
                  [_span(HTML_FAST), _span(kind="media",
                                           media_ref="/m/i.jpg")]),
    ]
    assert_equivalent(cfg, rows)


def test_slow_html_and_specials():
    cfg = default_config()
    rows = [
        _page_row("http://h1.example.com/p/x.html", "html",
                  [_span(HTML_SLOW)]),
        _page_row("http://h1.example.com/p/y.html", "html",
                  [_span(HTML_SPECIAL)]),
        _page_row("http://h1.example.com/t/n.txt", "text",
                  [_span("see http://h2.example.com/a.html here ")]),
    ]
    assert_equivalent(cfg, rows)


def test_redirects_and_loop_cap():
    cfg = default_config()
    rows = [
        _page_row("http://h1.example.com/p/a.html", "html", None,
                  status=301, location="http://h2.example.com/b.html"),
        _page_row("http://h1.example.com/p/c.html", "html", None,
                  status=302, location="/p/rel.html", depth=2),
        _page_row("http://h1.example.com/p/d.html", "html", None,
                  status=307, location="relative.html",
                  redirect_count=19),  # at the cap: dropped
        _page_row("http://h1.example.com/p/e.html", "html", None,
                  status=303, location="odd/../pop.html",
                  redirect_count=3),
    ]
    assert_equivalent(cfg, rows)


def test_external_and_www_handling():
    cfg = default_config()
    rows = [
        _page_row("http://www.h1.example.com/p/x.html", "html",
                  [_span('<a href="http://h1.example.com/same.html">s'
                         '</a><a href="https://h1.example.com/proto.html'
                         '">p</a><a href="http://other.com/o.html">o'
                         '</a><a href="HTTP://WWW.OTHER.COM/c.HTML">c'
                         '</a>')]),
        _page_row("http://h3.example.com/x.html", "html",
                  [_span('<a href="/child.html">c</a>')],
                  external=True),  # relative child inherits EXTERNAL
    ]
    assert_equivalent(cfg, rows)


def test_query_and_dynamic_shapes():
    cfg = default_config()
    body = (
        '<a href="/q/view.php?id=5">a</a>'
        '<a href="view.php?x=1&y=2">b</a>'
        '<a href="http://h2.example.com/s?q=term&start=0">c</a>'
        '<a href="/q/view.php?sp ace=1">enc</a>'
        '<a href="/q/a.php?x=1&amp;y=2">amp</a>'
        '<a href="/q/b.php?x=1#frag">frag</a>'
        '<a href="?bare=1">bareq</a>'
        '<a href="/dir/?q=1">dirq</a>'
    )
    rows = [_page_row("http://h1.example.com/p/x.html", "html",
                      [_span(body)])]
    assert_equivalent(cfg, rows)


def test_no_parser_filetype_and_null_spans():
    cfg = default_config()
    rows = [
        _page_row("http://h1.example.com/p/x.html", "html", None),
        _page_row("http://h1.example.com/t/n.txt", "text", []),
    ]
    assert_equivalent(cfg, rows)


def test_empty_batch():
    cfg = default_config()
    assert_equivalent(cfg, [])


# -- classification memo vs the real decision tree ---------------------------

def test_classify_key_matches_tree():
    """For a no-UMEX config the memoized key-classifier must equal
    match_by_url on every reachable canonical URL shape."""
    cfg = default_config()
    idx = FtIndex(cfg, cfg.crawler("default"))
    assert not has_umex(idx)
    urls = [
        "http://h.example.com/",
        "http://h.example.com/a/b.html",
        "http://h.example.com/a/b.HTM",
        "http://h.example.com/a/b.txt",
        "http://h.example.com/a/b.xyz",
        "http://h.example.com/a/b",
        "http://h.example.com/a/",
        "http://h.example.com/q?x=1",
        "http://h.example.com/q.php?x=1",
        "http://h.example.com/q.unknownext?x=1",
        "ftp://h.example.com/",
        "ftp://h.example.com/dir/",
        "ftp://h.example.com/f.txt",
        "ftp://h.example.com/f.xyz",
        "https://h.example.com/x.aspx",
        "file://h/x.jsp",
        "http://h.example.com/a/b.",  # ext_o set, EMPTY ext string
        "http://h.example.com/a/b.?q=1",
    ]
    for u in urls:
        p = parse_url(u)
        assert p is not None
        expect = idx.match_by_url(p)
        got = _classify_key(
            idx, p.protocol, p.ext, p.is_dynamic, p.is_dir,
            bool(p.ext_o),
        )
        assert got == expect, u


# -- hypothesis fuzz ----------------------------------------------------------

_href_piece = st.one_of(
    st.sampled_from(
        [
            "/p/a.html", "b.html", "../up.html", "./same.html",
            "//h2.example.com/x.html", "sub/", "/", ".", "..",
            "a//b.html", "/p/./x.html", "x.php?a=1", "?q=2",
            "x.html#f", "mailto:a@b.c", "javascript:void(0)",
            "http://h2.example.com/y.html", "HTTPS://H3.EXAMPLE.COM/",
            "ftp://f.example.com/d/", "ftp://f.example.com/f.txt",
            "http://h2.example.com:8080/p.html",
            "http://www.h1.example.com/z.html", "sp ace.html",
            "unié.html", "x.html?a=1&amp;b=2", "%41.html",
            "a.b.c.html", "", "#only", "[curie:ref]",
        ]
    ),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=24,
    ),
)


@st.composite
def _html_bodies(draw):
    n = draw(st.integers(0, 5))
    parts = []
    for _ in range(n):
        href = draw(_href_piece)
        style = draw(st.integers(0, 5))
        if style == 0:
            parts.append(f'<a href="{href}">t</a>')
        elif style == 1:
            parts.append(f"<a href='{href}'>t</a>")
        elif style == 2:
            parts.append(f'<img src="{href}"/>')
        elif style == 3:
            parts.append(f'<a class="k" href="{href}" id="z">t</a>')
        elif style == 4:
            parts.append(f'<a disabled href="{href}">t</a>')
        else:
            parts.append(f"<p>text {href} </p>")
    return "".join(parts)


@given(
    bodies=st.lists(_html_bodies(), min_size=1, max_size=4),
    base=st.sampled_from(
        [
            "http://h1.example.com/p/x.html",
            "http://www.h1.example.com/",
            "http://h1.example.com/q/view.php?id=1",
            "https://h2.example.com/a/b/c.html",
            "ftp://f.example.com/d/",
        ]
    ),
    external=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_resolver_equivalence(bodies, base, external):
    cfg = default_config()
    rows = [
        _page_row(base, "html", [_span(b) for b in bodies],
                  external=external)
    ]
    assert_equivalent(cfg, rows)


@given(
    location=st.one_of(
        _href_piece,
        st.sampled_from(
            ["http://h9.example.com/r.html", "/abs/r.html", "r.html"]
        ),
    ),
    rcount=st.integers(0, 20),
    status=st.sampled_from([200, 301, 302, 304, 399, 400, 500]),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_redirect_equivalence(location, rcount, status):
    cfg = default_config()
    rows = [
        _page_row(
            "http://h1.example.com/p/x.html", "html",
            [_span('<a href="/p/y.html">y</a>')],
            status=status, location=location or None,
            redirect_count=rcount,
        )
    ]
    assert_equivalent(cfg, rows)
