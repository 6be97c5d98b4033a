"""Unit tests for UMEX, ftindex classification, robots, and parsers.

Oracles hand-derived from /root/reference/src/libmetha/{umex,ftindex,
filter,worker,html,builtin}.c — citations in each module docstring.
"""

from methanol_web_crawler_spark.config import (
    CrawlConfig,
    Crawler,
    Filetype,
    default_config,
    media_config,
)
from methanol_web_crawler_spark.functions.canonicalize import parse_url
from methanol_web_crawler_spark.functions.classify import FT, HEAD, FtIndex
from methanol_web_crawler_spark.functions.parsers import (
    extract_css_urls,
    extract_html_links,
    extract_text_urls,
)
from methanol_web_crawler_spark.functions.robots import (
    parse_robots,
    robots_allows,
)
from methanol_web_crawler_spark.functions.umex import Umex, path_prefix_umex


def P(raw):
    p = parse_url(raw)
    assert p is not None
    return p


class TestUmex:
    def test_path_exact(self):
        u = Umex("PATH</abc>")
        assert u.match(P("http://x.com/abc"))
        assert not u.match(P("http://x.com/abcd"))

    def test_star_begin(self):
        u = Umex("PATH</a*>")
        assert u.match(P("http://x.com/abc"))
        assert not u.match(P("http://x.com/b"))

    def test_star_end(self):
        u = Umex("PATH<*.html>")
        assert u.match(P("http://x.com/a/b.html"))
        assert not u.match(P("http://x.com/a/b.htm"))

    def test_contains(self):
        u = Umex("PATH<*download*>")
        assert u.match(P("http://x.com/a/download/b"))
        assert not u.match(P("http://x.com/a/b"))

    def test_multi_segment(self):
        # google.conf: PATH</search?*q=*start=*>
        u = Umex("PATH</search?*q=*start=*>")
        assert u.match(P("http://g.com/search?x&q=cats&start=10"))
        assert not u.match(P("http://g.com/search?x&q=cats"))

    def test_anychar(self):
        u = Umex("FILE<a?c.html>")
        assert u.match(P("http://x.com/abc.html"))
        assert not u.match(P("http://x.com/ac.html"))

    def test_host_part(self):
        u = Umex("HOST<*.example.com>")
        assert u.match(P("http://sub.example.com/x"))
        assert not u.match(P("http://example.org/x"))

    def test_full_part(self):
        u = Umex("FULL<http://*>")
        assert u.match(P("http://x.com/a"))
        assert not u.match(P("ftp://x.com/a"))

    def test_file_part_includes_query(self):
        # FILE = everything after the last '/'
        u = Umex("FILE<x.php?id=*>")
        assert u.match(P("http://a.com/d/x.php?id=9"))

    def test_not_is_noop_quirk(self):
        # QUIRK: '!' is compiled but ignored by the reference VM
        u = Umex("!PATH</abc>")
        assert u.match(P("http://x.com/abc"))

    def test_path_prefix(self):
        u = path_prefix_umex("/private")
        assert u.match(P("http://x.com/private/x"))
        assert u.match(P("http://x.com/private"))
        assert not u.match(P("http://x.com/pub"))

    def test_path_includes_query(self):
        u = path_prefix_umex("/p")
        assert u.match(P("http://x.com/p?q=1"))


def make_index(crawler_kwargs=None, filetypes=None):
    if filetypes:
        cfg = CrawlConfig(
            filetypes=tuple(filetypes),
            crawlers=(
                Crawler(
                    name="c",
                    filetypes=tuple(f.name for f in filetypes),
                    **(crawler_kwargs or {}),
                ),
            ),
        )
        return FtIndex(cfg, cfg.crawler("c"))
    cfg = default_config(**(crawler_kwargs or {}))
    return FtIndex(cfg, cfg.crawler("default"))


class TestClassify:
    def test_ext_match(self):
        idx = make_index()
        assert idx.match_by_url(P("http://a.com/x.html")) == (FT, "html")
        assert idx.match_by_url(P("http://a.com/x.HTML")) == (FT, "html")
        assert idx.match_by_url(P("http://a.com/x.txt")) == (FT, "text")

    def test_ext_stops_at_query(self):
        idx = make_index()
        assert idx.match_by_url(P("http://a.com/x.php?a=1")) == (FT, "html")

    def test_dir_binding(self):
        idx = make_index()  # dir_url=@html
        assert idx.match_by_url(P("http://a.com/sub/")) == (FT, "html")

    def test_extless_binding(self):
        idx = make_index()
        assert idx.match_by_url(P("http://a.com/file")) == (FT, "html")

    def test_dynamic_binding(self):
        idx = make_index()
        assert idx.match_by_url(P("http://a.com/x?a=1")) == (FT, "html")

    def test_unknown_discard(self):
        idx = make_index()  # unknown_url=discard
        assert idx.match_by_url(P("http://a.com/x.exe")) == (None, None)

    def test_unknown_lookup_head(self):
        idx = make_index({"unknown_url": "lookup"})
        assert idx.match_by_url(P("http://a.com/x.exe")) == (HEAD, None)

    def test_lookup_bindings_head(self):
        idx = make_index(
            {"dir_url": "lookup", "extless_url": "lookup",
             "dynamic_url": "lookup"}
        )
        assert idx.match_by_url(P("http://a.com/sub/")) == (HEAD, None)
        assert idx.match_by_url(P("http://a.com/file")) == (HEAD, None)
        assert idx.match_by_url(P("http://a.com/x?a=1")) == (HEAD, None)

    def test_discard_bindings(self):
        idx = make_index(
            {"dir_url": "discard", "extless_url": "discard",
             "dynamic_url": "discard"}
        )
        assert idx.match_by_url(P("http://a.com/sub/")) == (None, None)
        assert idx.match_by_url(P("http://a.com/file")) == (None, None)
        assert idx.match_by_url(P("http://a.com/x?a=1")) == (None, None)

    def test_dynamic_discard_still_honors_umex(self):
        # QUIRK: "discard" falls through to the UMEX scan
        ftypes = [
            Filetype(name="search", expr="PATH</s?*q=*>", parsers=("html",)),
        ]
        idx = make_index({"dynamic_url": "discard"}, ftypes)
        assert idx.match_by_url(P("http://a.com/s?q=1")) == (FT, "search")
        assert idx.match_by_url(P("http://a.com/o?q=1")) == (None, None)

    def test_umex_confirm_on_ext(self):
        # extension match requires the filetype's UMEX to also match
        ftypes = [
            Filetype(
                name="ht",
                extensions=("html",),
                expr="HOST<good.com>",
                parsers=("html",),
            ),
        ]
        idx = make_index({"unknown_url": "discard"}, ftypes)
        assert idx.match_by_url(P("http://good.com/x.html")) == (FT, "ht")
        assert idx.match_by_url(P("http://bad.com/x.html")) == (None, None)

    def test_extless_umex_scan_before_bindings(self):
        ftypes = [
            Filetype(name="wiki", expr="PATH</wiki/*>", parsers=("html",)),
        ]
        idx = make_index({"extless_url": "discard", "dir_url": "discard"},
                         ftypes)
        assert idx.match_by_url(P("http://a.com/wiki/Cats")) == (FT, "wiki")

    def test_ftp_dir_binding(self):
        ftypes = [Filetype(name="ftp", parsers=("ftp",))]
        idx = make_index({"ftp_dir_url": "@ftp"}, ftypes)
        assert idx.match_by_url(P("ftp://f.com/pub/")) == (FT, "ftp")

    def test_ftp_dir_lookup_discards_quirk(self):
        # QUIRK: ftp dirs with lookup are discarded, not HEADed
        idx = make_index({"ftp_dir_url": "lookup"})
        assert idx.match_by_url(P("ftp://f.com/pub/")) == (None, None)

    def test_ftp_file_ext_only(self):
        idx = make_index()  # html ext list
        assert idx.match_by_url(P("ftp://f.com/x.html")) == (FT, "html")
        # no fallback bindings for ftp files
        assert idx.match_by_url(P("ftp://f.com/x.exe")) == (None, None)

    def test_ext_prefix_compare_quirk(self):
        # URL ext 'htm' prefix-matches config ext 'html' ONLY if they
        # hash to the same bucket; 'htm' and 'html' do not, so no match
        ftypes = [Filetype(name="h", extensions=("html",), parsers=("html",))]
        idx = make_index({"unknown_url": "discard"}, ftypes)
        assert idx.match_by_url(P("http://a.com/x.htm")) == (None, None)

    def test_mime_exact_match(self):
        idx = make_index()
        assert idx.match_by_mime("text/html") == "html"
        assert idx.match_by_mime("text/html; charset=utf-8") == "html"
        assert idx.match_by_mime("text/plain") == "text"
        assert idx.match_by_mime("image/png") is None

    def test_mime_prefix_never_matches_quirk(self):
        # conf/image.conf-style "image/" entries never match real mimes
        idx = FtIndex(
            media_config(), media_config().crawler("media")
        )
        assert idx.match_by_mime("image/png") is None

    def test_first_filetype_wins(self):
        ftypes = [
            Filetype(name="a", extensions=("zip",), parsers=("text",)),
            Filetype(name="b", extensions=("zip",), parsers=("text",)),
        ]
        idx = make_index({}, ftypes)
        assert idx.match_by_url(P("http://x.com/f.zip")) == (FT, "a")

    def test_media_targets(self):
        cfg = media_config()
        idx = FtIndex(cfg, cfg.crawler("media"))
        assert idx.match_by_url(P("http://a.com/i.png")) == (FT, "image")
        assert cfg.filetype("image").is_target_only
        assert not cfg.filetype("html").is_target_only


class TestRobots:
    def test_basic_disallow(self):
        rules = parse_robots(
            "User-agent: *\nDisallow: /private\n", "Methanol"
        )
        assert rules == [(False, "/private")]
        assert not robots_allows(rules, "/private/x")
        assert robots_allows(rules, "/public")

    def test_default_allow(self):
        assert robots_allows([], "/anything")

    def test_allow_before_first_deny_quirk(self):
        # filter.c:75-107: each Allow swaps with the FIRST Deny
        rules = []
        body = (
            "User-agent: *\n"
            "Disallow: /a\n"
            "Disallow: /b\n"
            "Allow: /a/ok\n"
            "Allow: /b/ok\n"
        )
        rules = parse_robots(body, "X")
        # insert order: D/a, D/b; A(/a/ok) swaps with D/a -> [A/a/ok, D/b, D/a]
        # A(/b/ok) swaps with D/b -> [A/a/ok, A/b/ok, D/a, D/b]
        assert rules == [
            (True, "/a/ok"),
            (True, "/b/ok"),
            (False, "/a"),
            (False, "/b"),
        ]
        assert robots_allows(rules, "/a/ok/x")
        assert not robots_allows(rules, "/a/no")

    def test_user_agent_substring(self):
        body = "User-agent: Metha\nDisallow: /x\n"
        assert parse_robots(body, "Methanol-Spark/0.1") == [(False, "/x")]
        assert parse_robots(body, "OtherBot") == []

    def test_rules_before_ua_enabled_quirk(self):
        # enable starts true (worker.c:995)
        assert parse_robots("Disallow: /x\n", "any") == [(False, "/x")]

    def test_other_ua_disables(self):
        body = "User-agent: Google\nDisallow: /x\nUser-agent: *\nDisallow: /y\n"
        assert parse_robots(body, "Methanol") == [(False, "/y")]

    def test_comments_skipped(self):
        body = "# hello\nUser-agent: *\n# nope\nDisallow: /x\n"
        assert parse_robots(body, "M") == [(False, "/x")]

    def test_colonless_line_aborts_quirk(self):
        body = "User-agent: *\nDisallow: /x\nbroken line\nDisallow: /y\n"
        assert parse_robots(body, "M") == [(False, "/x")]

    def test_empty_disallow_eats_next_line_quirk(self):
        # whitespace skip after ':' crosses the newline (worker.c:1023)
        body = "Disallow:\nAllow: /x\n"
        rules = parse_robots(body, "M")
        assert rules == [(False, "Allow: /x")]

    def test_empty_body(self):
        assert parse_robots(None, "M") == []
        assert parse_robots("", "M") == []


class TestHtmlParser:
    def test_href_and_src(self):
        body = '<a href="/x.html">x</a><img src="/i.png">'
        assert extract_html_links(body) == ["/x.html", "/i.png"]

    def test_anchor_skipped(self):
        assert extract_html_links('<a href="#top">t</a>') == []

    def test_first_href_only_per_tag(self):
        body = '<a href="/one" href="/two">'
        assert extract_html_links(body) == ["/one"]

    def test_unquoted_value(self):
        assert extract_html_links("<a href=/x.html>") == ["/x.html"]

    def test_single_quotes(self):
        assert extract_html_links("<a href='/x'>") == ["/x"]

    def test_case_insensitive_attr(self):
        assert extract_html_links('<A HREF="/x">') == ["/x"]

    def test_gt_inside_quoted_value_ok(self):
        body = '<a title="a>b" href="/x">'
        assert extract_html_links(body) == ["/x"]

    def test_style_content_css_extracted(self):
        body = '<style>body { background: url(/bg.png); }</style><a href="/y">'
        assert extract_html_links(body) == ["/bg.png", "/y"]

    def test_script_content_skipped(self):
        body = '<script>var a = "<a href=/no>";</script><a href="/yes">'
        assert extract_html_links(body) == ["/yes"]

    def test_curie_expansion(self):
        body = (
            '<html xmlns:foo="http://cdn.test/base/">'
            '<a href="[foo:img.png]">'
        )
        assert extract_html_links(body) == ["http://cdn.test/base/img.png"]

    def test_bare_attr_contamination_quirk(self):
        # html.c:233-240 — a bare attribute merges into the next name
        assert extract_html_links("<a disabled href=/x>") == []

    def test_order_is_document_order(self):
        body = '<a href="/1"><b src="/2"><i href="/3">'
        assert extract_html_links(body) == ["/1", "/2", "/3"]


class TestTextParser:
    def test_http_extracted(self):
        assert extract_text_urls("see http://a.com/x for info") == [
            "http://a.com/x"
        ]

    def test_ftp_extracted(self):
        assert extract_text_urls("at ftp://f.com/d, ok") == ["ftp://f.com/d"]

    def test_https_not_matched(self):
        assert extract_text_urls("see https://a.com/x here") == []

    def test_case_sensitive(self):
        assert extract_text_urls("HTTP://A.COM/X end") == []

    def test_charset_delimits(self):
        # '-' is not in the allowed set -> URL cut at it
        assert extract_text_urls("x http://a-b.com/ y") == ["http://a"]

    def test_eof_url_not_emitted_quirk(self):
        assert extract_text_urls("go to http://a.com/x") == []

    def test_multiple(self):
        assert extract_text_urls("a http://x.com/1 b http://y.com/2 c") == [
            "http://x.com/1",
            "http://y.com/2",
        ]


class TestCssParser:
    def test_paren_bare(self):
        assert extract_css_urls("a { b: url(/x.png); }") == ["/x.png"]

    def test_paren_double_quoted(self):
        assert extract_css_urls('a { b: url("/x.png"); }') == ["/x.png"]

    def test_paren_single_quoted(self):
        assert extract_css_urls("a { b: url('/x.png'); }") == ["/x.png"]

    def test_spaces(self):
        assert extract_css_urls("a { b: url ( /x.png); }") == ["/x.png"]

    def test_no_paren_semicolon(self):
        assert extract_css_urls("@import url /i.css;") == ["/i.css"]

    def test_multiple_in_order(self):
        css = "a{x:url(/1.png)} b{y:url('/2.png')}"
        assert extract_css_urls(css) == ["/1.png", "/2.png"]
