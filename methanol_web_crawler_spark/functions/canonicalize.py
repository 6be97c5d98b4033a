"""URL canonicalization with exact Methanol/libmetha semantics.

This module re-implements, from scratch in Python, the canonical-form
rules of the reference crawl engine (semantics derived from
/root/reference/src/libmetha/url.c:172-421 ``lm_url_set`` /
``lm_url_combine`` / ``lm_url_encodecpy``, urlengine.c:170-250
``ue_add``, str.c:35-66 ``lm_strtourl``, and mtrie.c:216-389 for the
seen-set key).  The seen-set — and therefore crawl ordering — depends
on reproducing these rules bit-for-bit, including the reference's
quirks, which are deliberately preserved and marked QUIRK below:

- percent-encode bytes <= 0x20 and >= 0x80 as uppercase %XX, but only
  *before* the first ``?`` — query strings are copied raw except
  space -> ``+`` and ``&amp;`` -> ``&`` (url.c:353 TODO quirk);
- ``#`` truncates; ``//+`` collapses; ``/./`` drops; ``/../`` pops one
  path segment, never above the host root;
- trailing ``/..`` pops *and* removes the trailing slash (QUIRK);
- trailing ``/.`` becomes ``.`` replacing the slash (QUIRK);
- ``www.`` is flagged and stripped for host *identity* only, never
  from the canonical string;
- the seen-set key is the canonical URL from the host onward
  (protocol excluded), case-folded (mtrie.c:230-231 + MTRIE_OFFS);
- unknown protocols are discarded entirely (never enter the seen set).

The scalar functions here are pure Python; at Spark level they are
applied inside Arrow-batched pandas UDFs (see ``udfs.py``), never as
row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional, Tuple

PROTOCOLS = ("http", "https", "ftp", "ftps", "file")
_PROTOCOL_SET = frozenset(PROTOCOLS)

MAX_URL_LEN = 65535  # reference stores sizes as uint16 (url.h:57-64)

_SLASH = 0x2F
_DOT = 0x2E
_QMARK = 0x3F
_HASH = 0x23
_AMP = 0x26
_SPACE = 0x20
_COLON = 0x3A
_HYPHEN = 0x2D
_PLUS = 0x2B


class ParsedUrl(NamedTuple):
    """Canonical URL plus the byte-offset projection columns.

    Mirrors the reference's url_t offsets (url.h:57-64) as materialized
    fields; ``url`` is the canonical string (latin-1-safe: one char per
    byte).
    """

    url: str
    host_o: int
    host_l: int
    file_o: int
    ext_o: int
    protocol: str
    is_dynamic: bool
    www_prefix: bool

    @property
    def host(self) -> str:
        return self.url[self.host_o : self.host_o + self.host_l]

    @property
    def host_identity(self) -> str:
        """Host with ``www.`` stripped, lowercased — cache/shard key."""
        h = self.host
        if self.www_prefix:
            h = h[4:]
        return h.lower()

    @property
    def path(self) -> str:
        """Everything from the host end (root slash) onward."""
        return self.url[self.host_o + self.host_l :]

    @property
    def ext(self) -> str:
        """File extension (after the last '.', stopping at '?'), or ''."""
        if not self.ext_o:
            return ""
        rest = self.url[self.ext_o + 1 :]
        q = rest.find("?")
        return rest[:q] if q >= 0 else rest

    @property
    def is_dir(self) -> bool:
        """True when the URL names a directory (file_o == sz-1)."""
        return self.file_o == len(self.url) - 1

    @property
    def filename(self) -> str:
        return self.url[self.file_o + 1 :]

    @property
    def seen_key(self) -> str:
        """Dedup key: canonical URL from host onward, case-folded.

        The reference's mtrie indexes from host_o and folds case
        (mtrie.c:230-231, MTRIE_OFFS in mtrie.h:32-33). The 6-bit
        collisions ('_'=='\"', '@'=='`') are NOT reproduced — they are
        hash-table artifacts, not semantics.
        """
        return self.url[self.host_o :].lower()


def _isalnum_ascii(c: int) -> bool:
    return (0x30 <= c <= 0x39) or (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A)


def _encodecpy(
    prefix: bytes, path: bytes, host_o: int, host_l: int
) -> Tuple[bytes, int, int, bool]:
    """Encode+normalize ``path`` appended after the untouched ``prefix``.

    Returns (full_url_bytes, file_o, ext_o, is_dynamic); file_o/ext_o
    are 0 when never set, matching the reference's update-if-nonzero
    behavior.
    """
    out = bytearray(prefix)
    prefix_sz = len(prefix)
    root = host_o + host_l  # index of the root '/'
    file_o = 0
    ext_o = 0
    is_dyn = False
    s = 0
    n = len(path)
    while s < n:
        c = path[s]
        if c <= 0x20 or c >= 0x80:
            out += b"%%%02X" % c
        elif c == _QMARK:
            is_dyn = True
            out.append(c)
            s += 1
            # QUIRK: everything after '?' is copied raw (no %-encoding),
            # except ' '->'+', '&amp;'->'&', and '#' cuts.
            while s < n:
                c = path[s]
                if c == _SPACE:
                    out.append(_PLUS)
                elif c == _AMP and path[s + 1 : s + 5] == b"amp;":
                    out.append(_AMP)
                    s += 4
                elif c == _HASH:
                    break
                else:
                    out.append(c)
                s += 1
            break
        elif c == _HASH:
            break
        elif c == _SLASH:
            while s + 1 < n and path[s + 1] == _SLASH:
                s += 1  # collapse '//'+
            nxt = path[s + 1] if s + 1 < n else 0
            nxt2 = path[s + 2] if s + 2 < n else 0
            nxt3 = path[s + 3] if s + 3 < n else 0
            if nxt == _DOT:
                if nxt2 == _DOT and (nxt3 == _SLASH or s + 3 >= n):
                    # '/../': pop one segment, never above host root.
                    t = len(out)
                    if t > root + 1:
                        t -= 1
                        while not (
                            t <= root
                            or (out[t] == _SLASH and t != prefix_sz - 1)
                        ):
                            t -= 1
                        del out[t:]
                    s += 3  # resume at the '/' after '..' (or at end)
                    continue
                elif nxt2 == _SLASH:
                    s += 2  # '/./' -> the next '/' is written below
                elif s + 2 >= n:
                    s += 1  # QUIRK: trailing '/.' writes '.' not '/'
            file_o = len(out)
            ext_o = 0
            out.append(path[s])
        elif c == _DOT:
            if s == 0 and n > 2 and path[1] == _DOT and path[2] == _SLASH:
                # leading '../' in a relative combine: pop from prefix
                t = len(out)
                if t > root + 1:
                    t -= 1
                    while not (
                        t <= root
                        or (out[t] == _SLASH and t != prefix_sz - 1)
                    ):
                        t -= 1
                    del out[t:]
                s += 2  # resume at the '/' of '../'
                continue
            elif s + 1 < n and path[s + 1] == _SLASH:
                s += 2  # './' skipped entirely (QUIRK: also after non-/)
                continue
            ext_o = len(out)
            out.append(c)
        else:
            out.append(c)
        s += 1
    return bytes(out), file_o, ext_o, is_dyn


# -- vectorization fast path -------------------------------------------------
#
# The scalar byte state machine below is exact but slow (~55% of crawl
# round time went through it, PLANS.md). The overwhelmingly common case
# — printable-ASCII URL, no '?'/'#', no '//' '/.' './' sequences, no
# port — canonicalizes to ITSELF, so its offsets can be computed with
# C-speed str/regex ops. Inputs outside that shape fall through to the
# exact state machine; equivalence on the fast set is enforced by the
# differential fuzz tests in tests/test_fastpath_diff.py plus the
# hand-derived unit vectors.

_SIMPLE_ABS_RE = re.compile(
    r"(?i:(https?|ftps?|file))://([A-Za-z0-9.\-]{1,255})"
    r"(/[\x21-\x7f]*)?\Z"
)
# any of these in the path region forces the slow path: '//' collapse,
# '/.'-family pops/quirks, './' skip quirk, query ('?'), fragment ('#')
_PATH_UNSAFE_RE = re.compile(r"//|/\.|\./|[?#]")
_SIMPLE_REL_RE = re.compile(r"[\x21-\x7f]+\Z")


def _www_of(host: str) -> bool:
    return len(host) > 4 and host[:4].lower() == "www."


def parse_url(raw: str) -> Optional[ParsedUrl]:
    """Canonicalize an absolute URL string (``lm_url_set`` semantics).

    Returns None when the URL must be discarded: missing/unknown
    protocol, illegal host characters, empty host position, oversize.
    """
    if not raw:
        return None
    m = _SIMPLE_ABS_RE.match(raw)
    if m is not None and len(raw) <= MAX_URL_LEN:
        path = m.group(3)
        host_o = m.start(2)
        host_l = m.end(2) - host_o
        host = m.group(2)
        if path is None:
            return ParsedUrl(
                raw + "/", host_o, host_l, len(raw), 0,
                m.group(1).lower(), False, _www_of(host),
            )
        if _PATH_UNSAFE_RE.search(path) is None:
            root = host_o + host_l
            fr = path.rfind("/")
            er = path.rfind(".")
            return ParsedUrl(
                raw, host_o, host_l, root + fr,
                root + er if er > fr else 0,
                m.group(1).lower(), False, _www_of(host),
            )
    b = raw.encode("utf-8", "surrogateescape")
    if len(b) > MAX_URL_LEN:
        return None
    i = 0
    n = len(b)
    while i < n and _isalnum_ascii(b[i]):
        i += 1
    if i >= n or b[i] != _COLON:
        return None  # no protocol -> not allowed
    proto = b[:i].decode("ascii").lower()
    if proto not in _PROTOCOL_SET:
        return None  # QUIRK: unknown protocols discarded outright
    s = i
    while True:
        s += 1
        if s >= n:
            return None  # 'http://' alone fails
        if b[s] != _SLASH:
            break
    host_o = s
    while True:
        s += 1
        if s >= n:
            # no path: append '/' (host case preserved verbatim)
            host_l = s - host_o
            www = host_l > 4 and b[host_o : host_o + 4].lower() == b"www."
            url_b, file_o, ext_o, is_dyn = _encodecpy(b, b"/", host_o, host_l)
            return ParsedUrl(
                url_b.decode("latin-1"),
                host_o,
                host_l,
                file_o or s,
                ext_o,
                proto,
                is_dyn,
                www,
            )
        c = b[s]
        if not _isalnum_ascii(c):
            if c == _SLASH:
                break
            if c not in (_DOT, _HYPHEN, _COLON):
                return None  # weird char in host -> discard
    host_l = s - host_o
    if host_l > 255:
        return None  # host limited to uint8 length (url.h:50-55)
    www = host_l > 4 and b[host_o : host_o + 4].lower() == b"www."
    url_b, file_o, ext_o, is_dyn = _encodecpy(b[:s], b[s:], host_o, host_l)
    return ParsedUrl(
        url_b.decode("latin-1"),
        host_o,
        host_l,
        file_o or s,
        ext_o,
        proto,
        is_dyn,
        www,
    )


def combine_url(base: ParsedUrl, href: str) -> Optional[ParsedUrl]:
    """Resolve a relative reference against ``base`` (``lm_url_combine``).

    href starting with '/' replaces the path from the host root;
    otherwise it is appended after the last '/' of base. The DYNAMIC
    flag is cleared; www flag inherited.
    """
    if (
        href
        and href[0] != "."
        and _SIMPLE_REL_RE.match(href) is not None
        and _PATH_UNSAFE_RE.search(href) is None
    ):
        if href[0] == "/":
            cut = base.host_o + base.host_l
        else:
            cut = base.file_o + 1
        prefix = base.url[:cut]
        if len(prefix) + len(href) <= MAX_URL_LEN and prefix.isascii():
            fr = href.rfind("/")
            er = href.rfind(".")
            file_o = base.file_o if fr < 0 else cut + fr
            if href[0] == "/":
                file_o = cut + fr
            return ParsedUrl(
                prefix + href, base.host_o, base.host_l, file_o,
                cut + er if er > fr else 0,
                base.protocol, False, base.www_prefix,
            )
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
        url_b.decode("latin-1"),
        base.host_o,
        base.host_l,
        file_o or init_file_o,
        ext_o,
        base.protocol,
        is_dyn,
        base.www_prefix,
    )


def hostcmp(a: ParsedUrl, b: ParsedUrl) -> bool:
    """True when hosts match, treating ``www.x == x`` (lm_url_hostcmp)."""
    ha = a.host.lower()
    hb = b.host.lower()
    if len(ha) == len(hb):
        return ha == hb
    if len(ha) < len(hb):
        ha, hb = hb, ha
    # only an exact 'www.' prefix difference of 4 chars matches
    return len(ha) - len(hb) == 4 and ha.startswith("www.") and ha[4:] == hb


def add_url(
    base: Optional[ParsedUrl], href: str, base_external: bool = False
) -> Optional[Tuple[ParsedUrl, bool]]:
    """Admission-time resolution (``ue_add``): returns (parsed, external).

    - href starting with '/' or relative: combined onto base; the
      combined URL INHERITS base's EXTERNAL flag (lm_url_combine keeps
      flags & ~DYNAMIC, url.c:296 — QUIRK: relative children of a
      peeked external page stay external and get discarded, while
      absolute same-host links continue the peek);
    - 'proto:...' with a known protocol: absolute; external iff the
      protocol or host differs from base (urlengine.c:199-203) —
      computed fresh, never inherited;
    - 'proto:...' with an unknown protocol (mailto:, javascript:):
      discarded entirely;
    - anything else: relative, combined after base's last '/'.
    """
    if not href:
        return None
    if base is None:
        p = parse_url(href)
        return (p, False) if p else None
    if href[0] == "/":
        p = combine_url(base, href)
        return (p, base_external) if p else None
    for ch in href:
        o = ord(ch)
        if not _isalnum_ascii(o if o < 128 else 0):
            if ch == ":":
                p = parse_url(href)
                if p is None:
                    return None
                external = p.protocol != base.protocol or not hostcmp(p, base)
                return (p, external)
            break
    p = combine_url(base, href)
    return (p, base_external) if p else None


def guess_seed_url(seed: str) -> str:
    """Protocol guessing for seed URLs (``lm_strtourl``, str.c:35-66)."""
    i = 0
    while i < len(seed) and _isalnum_ascii(ord(seed[i]) if ord(seed[i]) < 128 else 0):
        i += 1
    if i < len(seed) and seed[i] == ":":
        return seed
    if seed.startswith("/") or seed.startswith("./"):
        return "file://" + seed
    if seed[:4].lower() == "ftp.":
        return "ftp://" + seed
    return "http://" + seed
