"""Link-extraction parsers: html, text, css.

From-scratch Python re-implementations of the reference's builtin
parsers (/root/reference/src/libmetha/html.c:101-342 ``lm_parser_html``,
builtin.c:139-201 ``lm_extract_css_urls``/``lm_extract_text_urls``).
Each returns the ordered list of raw href strings found — admission
(canonicalize + dedup) happens downstream, mirroring the reference
where parsers call ``ue_add`` per found string.

Semantics preserved:

- html: fault-tolerant tag scan; quote-aware tag-end detection; only
  the FIRST href/src attribute per tag is taken (html.c:330-334);
  values starting with '#' are skipped; CURIE values ``[prefix:ref]``
  expand via ``xmlns:prefix`` declarations on the <html> tag;
  <style> tag content goes through the CSS extractor; <script> and
  <textarea> content is skipped (stub handlers in the reference);
  tag-name matching is prefix-based (parse_tag html.c:283-287:
  "<stylesheet" matches "style" — QUIRK preserved).
- text: finds "http://" / "ftp://" substrings (case-sensitive, https
  NOT matched) and extends over the charset [A-Za-z0-9%?=&/.]; a URL
  running to end-of-buffer is NOT emitted (builtin.c:185-195).
  DOCUMENTED DIVERGENCE: the reference's bounds check
  ``p-e >= protocols[x].len`` (builtin.c:184) compares a negative
  pointer difference against a positive int, so it is always false
  and the reference's text parser extracts nothing — dead code by an
  apparent sign bug (p-e vs p-start). We implement the documented
  intent; the crawl is otherwise identical because admission rules
  are unchanged.
- css: ``url(...)`` forms, quoted or bare; without parens the value
  runs to the closing quote or ';' (builtin.c:139-164). The reference
  emits an empty href for ``url ""`` (quote found at scan start);
  empty hrefs are dropped by our admission (the reference's behavior
  there reads adjacent memory — not reproducible).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

# special tags whose content is handled out-of-band (html.c:70-75)
_SPECIAL_TAGS = (("script", None), ("style", "css"), ("textarea", None))

_WS = " \t\r\n\f\v"


def _is_space(c: str) -> bool:
    return c in _WS


def _find_tag_end(body: str, start: int) -> Tuple[int, int]:
    """Quote-aware scan for the tag's '>' from ``start`` (position of
    '<'). Returns (tag_begin, tag_end) where tag_end is the index of
    '>'; a '<' inside the tag restarts it (fault tolerance,
    html.c:120-148). Returns (tb, -1) when no '>' is found."""
    tb = start
    s = start + 1
    n = len(body)
    while s < n:
        c = body[s]
        if c == "=":
            s += 1
            if s >= n:
                break
            q = body[s]
            if q == '"' or q == "'":
                nxt = body.find(q, s + 1)
                if nxt < 0:
                    return tb, -1
                s = nxt
            else:
                while s < n and body[s] != ">" and not _is_space(body[s]):
                    s += 1
                if s < n and body[s] == ">":
                    return tb, s
                continue
        elif c == "<":
            tb = s
        elif c == ">":
            return tb, s
        s += 1
    return tb, -1


def _next_attr(tag: str, pos: int) -> Optional[Tuple[str, str, int]]:
    """One (attr, value) from the tag body (html.c:219-271
    ``tag_next_attr``). Returns (name, value, next_pos) or None."""
    n = len(tag)
    p = pos
    while p < n:
        while p < n and _is_space(tag[p]):
            p += 1
        attr_start = p
        attr_len = -1
        while p < n:
            if _is_space(tag[p]):
                attr_len = p - attr_start
                p += 1
                while p < n and _is_space(tag[p]):
                    p += 1
                if p < n and tag[p] != "=":
                    # QUIRK (html.c:233-240): attr start is NOT reset,
                    # so a bare attribute contaminates the next name
                    # ("<a disabled href=x>" yields name "disabled href"
                    # and the link is missed)
                    continue
                break
            if tag[p] == "=":
                attr_len = p - attr_start
                break
            p += 1
        if attr_len < 0 or p >= n:
            return None
        p += 1  # past '='
        while p < n and _is_space(tag[p]):
            p += 1
        if p >= n:
            return None
        q = tag[p]
        if q == '"' or q == "'":
            end = tag.find(q, p + 1)
            if end < 0:
                end = n
            val = tag[p + 1 : end]
            nxt = end + 1
        else:
            end = p
            while end < n and not _is_space(tag[end]) and tag[end] != ">":
                end += 1
            val = tag[p:end]
            nxt = end
        return tag[attr_start : attr_start + attr_len], val, nxt
    return None


# -- fast path ---------------------------------------------------------------
#
# The per-char tag scanner below is exact but Python-slow; the common
# tag shapes — closing tags, comments, and open tags whose attributes
# are all double-quoted well-formed `name="value"` pairs — resolve with
# one compiled-regex match at C speed. Anything else (single quotes,
# unquoted values, bare attrs before href, '<' or '>' inside values,
# special/html-prefixed tags) falls through to the exact scanner.
# Equivalence on the fast set is enforced by the differential fuzz in
# tests/test_fastpath_diff.py plus the hand-derived unit vectors.

_AWS = r"[ \t\r\n\f\v]"  # the scanner's _WS, NOT regex \s (no unicode)
_HS = r"(?:[Hh][Rr][Ee][Ff]|[Ss][Rr][Cc])"
_NAME = r"[^ \t\r\n\f\v<>\"'=]+"
_QVAL = r'"[^"<>]*"'

# closing tags and comments with no '=' / quotes: nothing to extract
_FAST_SKIP = re.compile(r"[!/][^<>\"'=]*>")
# open tag: quoted attrs, at most one href/src (the first), quoted attrs
# or bare attrs after it
_FAST_TAG = re.compile(
    rf"[A-Za-z][^ \t\r\n\f\v<>\"'=]*"
    rf"(?:{_AWS}+(?!{_HS}{_AWS}*=){_NAME}{_AWS}*={_AWS}*{_QVAL})*"
    rf"(?:{_AWS}+{_HS}{_AWS}*={_AWS}*\"([^\"<>]*)\")?"
    rf"(?:{_AWS}+(?!{_HS}{_AWS}*=){_NAME}(?:{_AWS}*={_AWS}*{_QVAL})?)*"
    rf"{_AWS}*/?>"
)
_SPECIAL_PREFIXES = ("script", "style", "textarea", "html")


def extract_html_links(body: str) -> List[str]:
    """Ordered raw hrefs from an HTML document (``lm_parser_html``)."""
    links: List[str] = []
    curies: List[Tuple[str, str]] = []
    n = len(body)
    body_low = body.lower()
    p = 0
    while p < n:
        lt = body.find("<", p)
        if lt < 0:
            break
        m = _FAST_SKIP.match(body, lt + 1)
        if m is not None:
            p = m.end()
            continue
        m = _FAST_TAG.match(body, lt + 1)
        if m is not None and not body_low.startswith(
            _SPECIAL_PREFIXES, lt + 1
        ):
            val = m.group(1)
            if val:
                if val[0] == "[" and curies:
                    pass  # CURIE resolution: exact scanner below
                else:
                    if val[0] != "#":
                        links.append(val)
                    p = m.end()
                    continue
            else:
                p = m.end()
                continue
        tb, te = _find_tag_end(body, lt)
        if te < 0:
            break
        tag = body[tb + 1 : te]  # without '<' '>'
        # identify special tags by case-insensitive PREFIX (QUIRK)
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
            # collect CURIE xmlns: declarations (html.c:288-308)
            pos = 4  # past 'html' within the tag body
            while True:
                nxt = _next_attr(tag, pos)
                if nxt is None:
                    break
                aname, aval, pos = nxt
                if len(aname) > 6 and aname.lower().startswith("xmlns:"):
                    curies.append((aname[6:], aval))
        else:
            # skip the tag name, then scan attributes
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
                    break  # only the first href/src per tag
        p = te + 1
    return links


_TEXT_ALLOWED = re.compile(r"[A-Za-z0-9%?=&/.]")


def extract_text_urls(body: str) -> List[str]:
    """Ordered raw URLs from plain text (intended ``lm_extract_text_urls``
    semantics; see module docstring for the reference's dead-code bug).
    Only http:// and ftp:// (case-sensitive); charset-delimited; a URL
    reaching end-of-buffer is not emitted."""
    links: List[str] = []
    n = len(body)
    p = body.find("://")
    while p >= 0 and p < n:
        start = None
        if p >= 4 and body[p - 4 : p] == "http":
            start = p - 4
        elif p >= 3 and body[p - 3 : p] == "ftp":
            start = p - 3
        if start is not None:
            s = p + 3
            emitted = False
            while s < n:
                if not _TEXT_ALLOWED.match(body[s]):
                    links.append(body[start:s])
                    emitted = True
                    break
                s += 1
            # QUIRK: URL at end-of-buffer is never emitted
            p = body.find("://", s + 1) if s + 1 < n else -1
        else:
            p = body.find("://", p + 1)
    return links


def extract_css_urls(body: str) -> List[str]:
    """Ordered raw URLs from CSS (``lm_extract_css_urls``)."""
    links: List[str] = []
    n = len(body)
    p = body.find("url")
    while p >= 0:
        p += 3
        while p < n and _is_space(body[p]):
            p += 1
        if p >= n:
            break
        if body[p] == "(":
            p += 1
            while p < n and _is_space(body[p]):
                p += 1
            if p >= n:
                break
            if body[p] == '"':
                term = '")'
                p += 1
            elif body[p] == "'":
                term = "')"
                p += 1
            else:
                term = ")"
        else:
            if body[p] == '"':
                term = '"'
            elif body[p] == "'":
                term = "'"
            else:
                term = ";"
        s = body.find(term, p)
        if s < 0:
            p = body.find("url", p)
            continue
        if s > p:
            links.append(body[p:s])
        p = body.find("url", s)
    return links


# ---------------------------------------------------------------------------
# Parser registry (P8/P9): pluggable parser functions + chaining
# ---------------------------------------------------------------------------
#
# The reference lets configs chain parsers ("parser = \"a, b, c\"",
# metha.c:1219-1235) where each stage may REWRITE the shared buffer
# before the next runs (worker.c:836-911), and user JS parsers return
# URL arrays. Here a parser is a named Python function of one of two
# kinds:
#   "extract":   fn(text) -> list[str]   (emits candidate hrefs)
#   "transform": fn(text) -> str         (rewrites the buffer)
# Users plug their own with register_parser() — the Python-native
# replacement for the reference's JS/E4X parsers (P8).

import html as _htmllib

_PARSER_REGISTRY = {}


def register_parser(name: str, fn, kind: str = "extract") -> None:
    """Register a parser under ``name``.

    Kinds (P8/P11):
      - "extract":   fn(text) -> [href, ...]
      - "transform": fn(text) -> text' (rewrites the buffer for later
        chain stages, worker.c:836-911)
      - "attrs":     fn(text) -> ([href, ...], {attr: value, ...}) —
        the ``this.set_attribute`` analog (js.c:305-330): values are
        kept only for attribute names DECLARED on the filetype
        (lm_attrlist_prepare / lm_attribute_set, attr.c:35-60), and a
        fetched document with any attribute set is emitted as a
        target (worker.c:913-917 ``attributes.changed``).
    """
    assert kind in ("extract", "transform", "attrs")
    _PARSER_REGISTRY[name] = (kind, fn)


def resolve_parser(name: str):
    """(kind, fn) for a parser name, or None if unknown."""
    return _PARSER_REGISTRY.get(name)


# -- crawler init functions (S2) ---------------------------------------------
#
# The reference's crawler ``init`` option names a JS function called
# once before crawling with the command-line extra arguments; it
# returns the seed URL list (metha.c crawler_t.init; methabot passes
# its trailing args). scripts/google.js:7-15 and
# scripts/wikipedia.js:1-8 compose search URLs from query terms.
# Python-native registry, same naming scheme as parsers.

_INIT_REGISTRY = {}


def register_init(name: str, fn) -> None:
    """Register a crawler init function: fn(args) -> [seed_url, ...]"""
    _INIT_REGISTRY[name] = fn


def resolve_init(name: str):
    return _INIT_REGISTRY.get(name)


def google_search_init(q):
    """scripts/google.js:7-15: each arg becomes a search URL."""
    return [
        f"http://www.google.com/search?q={x}&start=0" for x in q
    ]


def wikipedia_search_init(q):
    """scripts/wikipedia.js:1-8."""
    return [
        f"http://en.wikipedia.org/w/index.php?search={x}"
        "&fulltext=Advanced+search"
        for x in q
    ]


_A_TAG_RE = re.compile(r"<a\s[^>]*>")
_CLASS_RE = re.compile(r'class="([^"]*)"')
_HREF_RE = re.compile(r'href="([^"]*)"')
_TITLE_ATTR_RE = re.compile(r'title="([^"]*)"')
_UL_RE = re.compile(r"<ul\s[^>]*>.*?</ul", re.S)


def google_result_links(text: str):
    """scripts/google.js:17-29 ``parser()``: hrefs of <a> elements
    whose class is exactly "l" (E4X ``url.@class == "l"``). Runs over
    the xmlconv'd buffer (lowercased tags, double-quoted attrs)."""
    out = []
    for tag in _A_TAG_RE.findall(text):
        cm = _CLASS_RE.search(tag)
        if cm and cm.group(1) == "l":
            hm = _HREF_RE.search(tag)
            if hm:
                out.append(hm.group(1))
    return out


def wikipedia_results(text: str):
    """scripts/wikipedia.js:10-24 ``parser()``: for each
    <ul class="mw-search-results"> item, the reference prints
    ``<title>: http://en.wikipedia.org<href>`` and returns null (no
    links). A distributed engine has no per-document stdout, so the
    printed lines are routed through the declared attribute
    ``results`` instead (the same print->attribute mapping as the
    misc.js analogs)."""
    lines = []
    for ul in _UL_RE.findall(text):
        head = ul[: ul.find(">") + 1]
        cm = _CLASS_RE.search(head)
        if not cm or cm.group(1) != "mw-search-results":
            continue
        for tag in _A_TAG_RE.findall(ul):
            tm = _TITLE_ATTR_RE.search(tag)
            hm = _HREF_RE.search(tag)
            if tm and hm:
                lines.append(
                    f"{tm.group(1)}: http://en.wikipedia.org"
                    f"{hm.group(1)}"
                )
    return [], ({"results": "\n".join(lines)} if lines else {})


def entity_decode(text: str) -> str:
    """entityconv (P7): SGML/HTML entities -> unicode text
    (entityconv.c's ~250-entity table, expressed via the stdlib's
    superset table)."""
    return _htmllib.unescape(text)


# -- misc.js analogs (P11) ----------------------------------------------------
#
# The reference ships E4X parsers (scripts/misc.js) that run after
# xmlconv: title() prints the <title> and returns xml..a.@href; meta()
# prints each <meta> name/content pair and returns xml..a.@href. A
# distributed engine has no stdout channel per document, so the analogs
# route the extracted values through the declared-attribute mechanism
# instead (the reference's own data-out path for parser results,
# methanol.texinfo:148-154): title sets attribute "title", meta sets
# one attribute per <meta name>. Both run over the xmlconv'd buffer,
# where tags/attrs are lowercased and values double-quoted, so the
# regexes below are exact there.

_ANCHOR_HREF_RE = re.compile(r'<a\s[^>]*?href="([^"]*)"')
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title", re.S)
_META_RE = re.compile(r'<meta\s[^>]*>', re.S)
_META_NAME_RE = re.compile(r'name="([^"]*)"')
_META_CONTENT_RE = re.compile(r'content="([^"]*)"')


def extract_anchor_hrefs(text: str) -> List[str]:
    """The xml..a.@href analog: href attributes of <a> elements only
    (narrower than the html parser's any-tag href/src)."""
    return _ANCHOR_HREF_RE.findall(text)


def title_attrs(text: str):
    """scripts/misc.js:34-41 ``title()`` analog (see section note)."""
    m = _TITLE_RE.search(text)
    attrs = {"title": m.group(1)} if m else {}
    return extract_anchor_hrefs(text), attrs


def meta_attrs(text: str):
    """scripts/misc.js:20-31 ``meta()`` analog (see section note)."""
    attrs = {}
    for tag in _META_RE.findall(text):
        nm = _META_NAME_RE.search(tag)
        cm = _META_CONTENT_RE.search(tag)
        if nm and cm:
            attrs[nm.group(1)] = cm.group(1)
    return extract_anchor_hrefs(text), attrs


def source_attrs(text: str):
    """scripts/misc.js:14-17 ``source()`` analog: print(this.data) ->
    attribute "source"; returns undefined in the reference, so no
    links."""
    return [], {"source": text}


def xmlsource_attrs(text: str):
    """scripts/misc.js:4-9 ``xmlsource()`` analog: runs after xmlconv
    in conf/xmlsource.conf, so the buffer IS the XML serialization the
    reference prints; links are ``xml..a.@href``."""
    return extract_anchor_hrefs(text), {"xmlsource": text}


def validator_attrs(text: str):
    """scripts/validate.js ``validator()`` analog. The reference GETs
    http://validator.w3.org/check for each page — an external service
    call this sandbox cannot make, so the error/warning counts are a
    clearly-marked DETERMINISTIC FAKE keyed on the content (the same
    honest-stub convention as the media codecs, operators/media.py);
    the local half (link extraction ``xml..a.@href``) is real."""
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) & 0x7FFFFFFF
    attrs = {
        "validator": (
            f"Errors: {h % 7}\nWarnings: {(h >> 3) % 13}\n"
            "(deterministic fake: validator.w3.org is not reachable "
            "from this engine; counts are a content-keyed stub)"
        )
    }
    return extract_anchor_hrefs(text), attrs


_YT_DIV_RE = re.compile(r"<div\s[^>]*>.*?</div", re.S)


def youtube_results(text: str):
    """scripts/youtube.js ``youtube()`` analog: for each
    <div class="video-long-title">, print the first <a>'s title and
    absolute URL; returns undefined (no links). Printed lines route
    through the declared attribute ``videos``."""
    lines = []
    for div in _YT_DIV_RE.findall(text):
        head = div[: div.find(">") + 1]
        cm = _CLASS_RE.search(head)
        if not cm or cm.group(1) != "video-long-title":
            continue
        tag = _A_TAG_RE.search(div)
        if not tag:
            continue
        tm = _TITLE_ATTR_RE.search(tag.group(0))
        hm = _HREF_RE.search(tag.group(0))
        if tm and hm:
            lines.append(tm.group(1))
            lines.append("http://www.youtube.com" + hm.group(1))
    return [], ({"videos": "\n".join(lines)} if lines else {})


def youtube_search_init(args):
    """scripts/youtube.js:1-10 ``init()``."""
    return [
        f"http://www.youtube.com/results?search_query={x}"
        "&search_type=&aq=f"
        for x in args
    ]


def _register_builtins():
    from .ftplist import extract_ftp_links
    from .xmlconv import html_to_xml

    register_parser("html", extract_html_links, "extract")
    register_parser("ftp", extract_ftp_links, "extract")
    register_parser("text", extract_text_urls, "extract")
    register_parser("css", extract_css_urls, "extract")
    register_parser("xmlconv", html_to_xml, "transform")
    register_parser("entityconv", entity_decode, "transform")
    # conf files name user scripts as "<file>/<function>"; register the
    # misc.js analogs under both the conf spelling and a short alias
    register_parser("misc.js/title", title_attrs, "attrs")
    register_parser("misc.js/meta", meta_attrs, "attrs")
    register_parser("title", title_attrs, "attrs")
    register_parser("meta", meta_attrs, "attrs")
    # shipped JS script analogs (S2 init fns + result parsers)
    register_parser("google.js/parser", google_result_links, "extract")
    register_parser("wikipedia.js/parser", wikipedia_results, "attrs")
    register_init("google.js/google_search_init", google_search_init)
    register_init(
        "wikipedia.js/wikipedia_search_init", wikipedia_search_init
    )
    # remaining shipped-script analogs (conf/source.conf,
    # xmlsource.conf, validate.conf, youtube.conf)
    register_parser("misc.js/source", source_attrs, "attrs")
    register_parser("misc.js/xmlsource", xmlsource_attrs, "attrs")
    register_parser("html.js/html", extract_anchor_hrefs, "extract")
    register_parser("validate.js/validator", validator_attrs, "attrs")
    register_parser("youtube.js/youtube", youtube_results, "attrs")
    register_init("youtube.js/init", youtube_search_init)


_register_builtins()
