"""Differential fuzz: the regex fast paths in canonicalize/parsers must
be byte-identical to the exact byte state machines on EVERY input (fast
set or not — non-fast inputs fall through, so equality is trivial there;
the fuzz hunts for inputs the fast path wrongly claims).

The reference implementations below are verbatim copies of the scalar
paths as they stood before the fast paths landed (they call the same
``_encodecpy`` the live code uses, so the spec anchor is the byte
machine itself plus the hand-derived unit vectors in
test_canonicalize.py / test_classify_umex_robots_parsers.py).
"""

from hypothesis import given, settings, strategies as st

from methanol_web_crawler_spark.functions.canonicalize import (
    MAX_URL_LEN,
    ParsedUrl,
    _encodecpy,
    _isalnum_ascii,
    _COLON,
    _HYPHEN,
    _DOT,
    _SLASH,
    _PROTOCOL_SET,
    combine_url,
    parse_url,
)


def _ref_parse_url(raw):
    if not raw:
        return None
    b = raw.encode("utf-8", "surrogateescape")
    if len(b) > MAX_URL_LEN:
        return None
    i = 0
    n = len(b)
    while i < n and _isalnum_ascii(b[i]):
        i += 1
    if i >= n or b[i] != _COLON:
        return None
    proto = b[:i].decode("ascii").lower()
    if proto not in _PROTOCOL_SET:
        return None
    s = i
    while True:
        s += 1
        if s >= n:
            return None
        if b[s] != _SLASH:
            break
    host_o = s
    while True:
        s += 1
        if s >= n:
            host_l = s - host_o
            www = host_l > 4 and b[host_o : host_o + 4].lower() == b"www."
            url_b, file_o, ext_o, is_dyn = _encodecpy(
                b, b"/", host_o, host_l
            )
            return ParsedUrl(
                url_b.decode("latin-1"), host_o, host_l, file_o or s,
                ext_o, proto, is_dyn, www,
            )
        c = b[s]
        if not _isalnum_ascii(c):
            if c == _SLASH:
                break
            if c not in (_DOT, _HYPHEN, _COLON):
                return None
    host_l = s - host_o
    if host_l > 255:
        return None
    www = host_l > 4 and b[host_o : host_o + 4].lower() == b"www."
    url_b, file_o, ext_o, is_dyn = _encodecpy(b[:s], b[s:], host_o, host_l)
    return ParsedUrl(
        url_b.decode("latin-1"), host_o, host_l, file_o or s, ext_o,
        proto, is_dyn, www,
    )


def _ref_combine_url(base, href):
    hb = href.encode("utf-8", "surrogateescape")
    base_b = base.url.encode("latin-1")
    if hb[:1] == b"/":
        prefix = base_b[: base.host_o + base.host_l]
        init_file_o = base.host_o + base.host_l
    else:
        prefix = base_b[: base.file_o + 1]
        init_file_o = base.file_o
    if len(prefix) + len(hb) > MAX_URL_LEN:
        return None
    url_b, file_o, ext_o, is_dyn = _encodecpy(
        prefix, hb, base.host_o, base.host_l
    )
    return ParsedUrl(
        url_b.decode("latin-1"), base.host_o, base.host_l,
        file_o or init_file_o, ext_o, base.protocol, is_dyn,
        base.www_prefix,
    )


# strategies biased toward the fast-path boundary: dots, slashes,
# queries, fragments, unicode, and plain URL-ish runs
_urlish = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019.-/?#&%:_~ \t\x00\x80é[]()'\"=+")
    ),
    min_size=0,
    max_size=40,
)
_proto = st.sampled_from(
    ["http", "https", "ftp", "ftps", "file", "HTTP", "mailto", "ht tp"]
)


@settings(max_examples=3000, deadline=None)
@given(_proto, _urlish)
def test_parse_url_fast_equals_ref(proto, rest):
    raw = f"{proto}://{rest}"
    assert parse_url(raw) == _ref_parse_url(raw)


@settings(max_examples=1500, deadline=None)
@given(_urlish)
def test_parse_url_fast_equals_ref_rawtext(raw):
    assert parse_url(raw) == _ref_parse_url(raw)


_BASES = [
    parse_url("http://www.example.test/a/b/page.html?x=1"),
    parse_url("https://h7.test/"),
    parse_url("ftp://files.test/pub/dir/"),
    parse_url("http://h.test/deep/.././x/doc.php?q=2&r=3"),
    parse_url("http://h.test"),
]


@settings(max_examples=3000, deadline=None)
@given(st.sampled_from([b for b in _BASES if b]), _urlish)
def test_combine_url_fast_equals_ref(base, href):
    assert combine_url(base, href) == _ref_combine_url(base, href)


# -- extract_html_links fast path vs the exact scanner -----------------------

from methanol_web_crawler_spark.functions.parsers import (  # noqa: E402
    _SPECIAL_TAGS,
    _find_tag_end,
    _is_space,
    _next_attr,
    extract_css_urls,
    extract_html_links,
)


def _ref_extract_html_links(body):
    """Verbatim pre-fast-path scanner loop."""
    links = []
    curies = []
    n = len(body)
    body_low = body.lower()
    p = 0
    while p < n:
        lt = body.find("<", p)
        if lt < 0:
            break
        tb, te = _find_tag_end(body, lt)
        if te < 0:
            break
        tag = body[tb + 1 : te]
        low = tag.lower()
        special = None
        for name, handler in _SPECIAL_TAGS:
            if len(name) < len(tag) + 1 and low.startswith(name):
                special = (name, handler)
                break
        if special is not None:
            name, handler = special
            close = body_low.find("</" + name, te + 1)
            if close < 0:
                break
            content = body[te + 1 : close]
            if handler == "css":
                links.extend(extract_css_urls(content))
            p = close + 2 + len(name) + 1
            continue
        if low.startswith("html"):
            pos = 4
            while True:
                nxt = _next_attr(tag, pos)
                if nxt is None:
                    break
                aname, aval, pos = nxt
                if len(aname) > 6 and aname.lower().startswith("xmlns:"):
                    curies.append((aname[6:], aval))
        else:
            pos = 0
            while pos < len(tag) and not _is_space(tag[pos]):
                pos += 1
            while True:
                nxt = _next_attr(tag, pos)
                if nxt is None:
                    break
                aname, aval, pos = nxt
                an = aname.lower()
                if an == "href" or an == "src":
                    if aval[:1] == "[" and curies:
                        for prefix, url in curies:
                            if (
                                len(aval) > len(prefix) + 3
                                and aval[1 : 1 + len(prefix)].lower()
                                == prefix.lower()
                                and aval[1 + len(prefix)] == ":"
                            ):
                                links.append(
                                    url + aval[2 + len(prefix) : -1]
                                )
                                break
                    elif aval[:1] != "#" and aval:
                        links.append(aval)
                    break
        p = te + 1
    return links


_htmlish = st.text(
    alphabet=st.sampled_from(
        list("<>ab hrefsrc=\"'/.#[]:xmlnscriptyle!-\t\n")
    ),
    min_size=0,
    max_size=80,
)

_tagparts = st.lists(
    st.sampled_from(
        [
            '<a href="x.html">',
            "<a href='y.html'>",
            "<a href=z.html>",
            '<img src="p.png"/>',
            '<a class="c" href="q/r">',
            '<a disabled href="miss">',
            "</a>",
            "<p>",
            "<!-- c=1 -->",
            "<style>u{background:url(s.css)}</style>",
            '<script>var x="<a href=\\"no\\">";</script>',
            '<html xmlns:dc="http://dc.test/">',
            '<a href="[dc:item]">',
            "<a href=\"#frag\">",
            '<a href="">',
            "text ",
            "<A HREF=\"UP.html\">",
            "< a>",
            '<a href="a<b">',
            '<a href="x" src="second">',
        ]
    ),
    min_size=0,
    max_size=12,
).map("".join)


@settings(max_examples=2000, deadline=None)
@given(_htmlish)
def test_extract_html_links_fast_equals_ref_fuzz(body):
    assert extract_html_links(body) == _ref_extract_html_links(body)


@settings(max_examples=2000, deadline=None)
@given(_tagparts)
def test_extract_html_links_fast_equals_ref_structured(body):
    assert extract_html_links(body) == _ref_extract_html_links(body)
