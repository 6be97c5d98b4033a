"""Unit vectors for URL canonicalization.

Every case is hand-derived from the reference semantics
(/root/reference/src/libmetha/url.c:172-421, urlengine.c:170-250,
str.c:35-66) — see the rule list in SURVEY.md §1.3.
"""

import pytest

from methanol_web_crawler_spark.functions.canonicalize import (
    ParsedUrl,
    add_url,
    combine_url,
    guess_seed_url,
    hostcmp,
    parse_url,
)


def P(raw):
    p = parse_url(raw)
    assert p is not None, raw
    return p


class TestParse:
    def test_basic(self):
        p = P("http://example.com/a/b.html")
        assert p.url == "http://example.com/a/b.html"
        assert p.host == "example.com"
        assert p.path == "/a/b.html"
        assert p.ext == "html"
        assert p.filename == "b.html"
        assert p.protocol == "http"
        assert not p.is_dynamic and not p.www_prefix and not p.is_dir

    def test_no_path_appends_slash(self):
        p = P("http://example.com")
        assert p.url == "http://example.com/"
        assert p.is_dir and p.path == "/"

    def test_trailing_slash_is_dir(self):
        assert P("http://a.com/x/").is_dir

    def test_unknown_protocol_discarded(self):
        assert parse_url("mailto:x@y.com") is None
        assert parse_url("javascript:void(0)") is None
        assert parse_url("gopher://x.com/") is None

    def test_no_protocol_discarded(self):
        assert parse_url("example.com/x") is None
        assert parse_url("//example.com/x") is None

    def test_protocol_case_insensitive(self):
        p = P("HTTP://A.com/x")
        assert p.protocol == "http"
        # prefix is copied untouched — case preserved in the string
        assert p.url == "HTTP://A.com/x"

    def test_all_known_protocols(self):
        for proto in ("http", "https", "ftp", "ftps", "file"):
            assert P(proto + "://x.com/").protocol == proto

    def test_bad_host_chars_discarded(self):
        assert parse_url("http://exa mple.com/") is None
        assert parse_url("http://exa_mple.com/") is None

    def test_host_allows_dot_dash_colon(self):
        assert P("http://a-b.c:8080/x").host == "a-b.c:8080"

    def test_empty_after_protocol_discarded(self):
        assert parse_url("http://") is None
        assert parse_url("http:") is None

    def test_extra_slashes_after_protocol(self):
        # the reference skips all '/' after ':' before the host
        assert P("http:////a.com/x").host == "a.com"
        assert P("http:a.com").url == "http:a.com/".replace(":", ":")

    def test_www_prefix_flagged_not_stripped(self):
        p = P("http://www.example.com/")
        assert p.www_prefix
        assert p.host == "www.example.com"
        assert p.host_identity == "example.com"

    def test_www_exact_len_guard(self):
        assert not P("http://www./x").www_prefix is True or True
        # host_l > 4 required: 'www.' alone (host_l==4) is not flagged
        p = parse_url("http://www./x")
        assert p is not None and not p.www_prefix

    def test_fragment_cut(self):
        assert P("http://a.com/x#frag").url == "http://a.com/x"

    def test_fragment_cut_in_query(self):
        assert P("http://a.com/x?a=1#frag").url == "http://a.com/x?a=1"

    def test_dynamic_flag(self):
        assert P("http://a.com/x?a=1").is_dynamic
        assert not P("http://a.com/x").is_dynamic

    def test_query_space_to_plus(self):
        assert P("http://a.com/s?q=a b").url == "http://a.com/s?q=a+b"

    def test_query_amp_entity(self):
        assert P("http://a.com/s?a=1&amp;b=2").url == "http://a.com/s?a=1&b=2"

    def test_query_not_percent_encoded_quirk(self):
        # url.c:353 TODO — bytes after '?' are copied raw
        p = P("http://a.com/s?q=\x7f~")
        assert p.url == "http://a.com/s?q=\x7f~"

    def test_percent_encoding_path(self):
        assert P("http://a.com/a b").url == "http://a.com/a%20b"
        assert P("http://a.com/\x01x").url == "http://a.com/%01x"

    def test_percent_encoding_high_bytes_utf8(self):
        # 'é' = 0xC3 0xA9 in UTF-8; each byte encoded, uppercase hex
        assert P("http://a.com/é").url == "http://a.com/%C3%A9"

    def test_slash_collapse(self):
        assert P("http://a.com//x///y").url == "http://a.com/x/y"

    def test_dot_segment_dropped(self):
        assert P("http://a.com/a/./b").url == "http://a.com/a/b"

    def test_dotdot_pops_segment(self):
        assert P("http://a.com/a/b/../c").url == "http://a.com/a/c"

    def test_dotdot_never_above_root(self):
        assert P("http://a.com/../../x").url == "http://a.com/x"

    def test_trailing_dotdot_pops_and_strips_slash(self):
        # QUIRK: '/x/y/..' -> '/x' (no trailing slash)
        assert P("http://a.com/x/y/..").url == "http://a.com/x"

    def test_ext_stops_at_query(self):
        p = P("http://a.com/f.php?x=1.html")
        assert p.ext == "php"

    def test_ext_only_after_last_slash(self):
        assert P("http://a.com/a.b/c").ext == ""
        assert P("http://a.com/a.b/c.d").ext == "d"

    def test_dir_url_detection(self):
        assert P("http://a.com/x/").is_dir
        assert not P("http://a.com/x").is_dir

    def test_oversize_discarded(self):
        assert parse_url("http://a.com/" + "x" * 70000) is None


class TestCombine:
    def test_relative_appended_after_last_slash(self):
        base = P("http://google.com/abc/")
        assert combine_url(base, "xyz.htm").url == "http://google.com/abc/xyz.htm"

    def test_relative_replaces_filename(self):
        base = P("http://a.com/d/page.html")
        assert combine_url(base, "other.html").url == "http://a.com/d/other.html"

    def test_absolute_path_from_root(self):
        base = P("http://google.com/abc/")
        assert combine_url(base, "/xyz.htm").url == "http://google.com/xyz.htm"

    def test_dotdot_relative(self):
        base = P("http://a.com/x/y/")
        assert combine_url(base, "../z").url == "http://a.com/x/z"

    def test_dotdot_relative_at_root(self):
        # QUIRK: the pop guard (t > root+1) fails at the root, so the
        # '/' of '../' is appended after the prefix's own trailing
        # slash (url.c:374-386) — the reference emits a double slash.
        base = P("http://a.com/")
        assert combine_url(base, "../z").url == "http://a.com//z"

    def test_dot_slash_relative(self):
        base = P("http://a.com/d/")
        assert combine_url(base, "./z").url == "http://a.com/d/z"

    def test_dynamic_cleared_then_recomputed(self):
        base = P("http://a.com/p?x=1")
        c = combine_url(base, "q.html")
        assert not c.is_dynamic
        c2 = combine_url(base, "q.html?y=2")
        assert c2.is_dynamic

    def test_combine_base_with_query(self):
        # base file_o is at the last '/', so the query is dropped
        base = P("http://a.com/d/p?x=1")
        assert combine_url(base, "z").url == "http://a.com/d/z"

    def test_query_relative(self):
        base = P("http://a.com/search")
        c = combine_url(base, "?q=1")
        assert c.url == "http://a.com/?q=1"


class TestAddUrl:
    def test_absolute_same_host_not_external(self):
        base = P("http://a.com/x/")
        p, ext = add_url(base, "http://a.com/y")
        assert p.url == "http://a.com/y" and not ext

    def test_absolute_other_host_external(self):
        base = P("http://a.com/x/")
        p, ext = add_url(base, "http://b.com/y")
        assert ext

    def test_www_host_identity_not_external(self):
        base = P("http://a.com/")
        p, ext = add_url(base, "http://www.a.com/y")
        assert not ext

    def test_protocol_mismatch_external(self):
        base = P("http://a.com/")
        p, ext = add_url(base, "https://a.com/y")
        assert ext

    def test_unknown_protocol_dropped(self):
        base = P("http://a.com/")
        assert add_url(base, "mailto:x@y.z") is None
        assert add_url(base, "javascript:void(0)") is None

    def test_relative(self):
        base = P("http://a.com/d/")
        p, ext = add_url(base, "f.html")
        assert p.url == "http://a.com/d/f.html" and not ext

    def test_colon_later_in_relative(self):
        # non-alnum before ':' ends the protocol scan -> relative
        base = P("http://a.com/d/")
        p, ext = add_url(base, "a/b:c")
        assert p.url == "http://a.com/d/a/b:c"

    def test_empty_dropped(self):
        assert add_url(P("http://a.com/"), "") is None


class TestHostcmp:
    def test_equal(self):
        assert hostcmp(P("http://a.com/"), P("http://A.COM/x"))

    def test_www_equivalence(self):
        assert hostcmp(P("http://www.a.com/"), P("http://a.com/"))
        assert hostcmp(P("http://a.com/"), P("http://www.a.com/"))

    def test_not_equal(self):
        assert not hostcmp(P("http://a.com/"), P("http://b.com/"))
        assert not hostcmp(P("http://aa.com/"), P("http://a.com/"))


class TestSeedGuess:
    def test_protocol_kept(self):
        assert guess_seed_url("http://x.com/") == "http://x.com/"

    def test_file(self):
        assert guess_seed_url("/tmp/x") == "file:///tmp/x"
        assert guess_seed_url("./x") == "file://./x"

    def test_ftp(self):
        assert guess_seed_url("ftp.x.com") == "ftp://ftp.x.com"

    def test_http_default(self):
        assert guess_seed_url("www.google.com/x/") == "http://www.google.com/x/"


class TestSeenKey:
    def test_protocol_excluded(self):
        assert P("http://a.com/x").seen_key == P("https://a.com/x").seen_key

    def test_case_folded(self):
        assert P("http://A.com/X").seen_key == P("http://a.com/X".lower()).seen_key

    def test_www_not_stripped_in_seen_key(self):
        # mtrie keys from host_o include the www. prefix
        assert P("http://www.a.com/x").seen_key != P("http://a.com/x").seen_key


class TestIdempotence:
    @pytest.mark.parametrize(
        "raw",
        [
            "http://a.com/a/b.html",
            "http://a.com/",
            "http://a.com/s?q=a+b&c=d",
            "http://www.a.com/x%20y",
            "ftp://f.com/dir/",
        ],
    )
    def test_reparse_stable(self, raw):
        p1 = parse_url(raw)
        p2 = parse_url(p1.url)
        assert p2.url == p1.url
        assert p2[1:] == p1[1:]
