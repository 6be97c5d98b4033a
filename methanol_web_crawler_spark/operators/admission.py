"""Link admission: canonicalize -> classify -> route.

The scalar core shared by the pure-Python oracle and the Spark
pandas-UDF wrappers (udfs.py). Mirrors the reference's admission flow,
which runs at link-extraction time (ue_add, urlengine.c:170-250) and
at sort time (lm_worker_sort + lm_worker_bind_url, worker.c:538-714):

1. resolve the raw href against the base URL (relative/absolute,
   unknown protocol -> dropped before the seen set);
2. seen-set insertion happens HERE, before classification — URLs that
   classification later discards still occupy the seen set (QUIRK);
3. classify via the ftindex decision tree; POSSIBLE_MATCH rows are
   resolved by content-type (the reference's HTTP HEAD — here a
   lookup/join against the docs table);
4. route: discard | target (no parser -> emitted without fetching,
   worker.c:675-714) | frontier (parser filetypes, depth+1) |
   external handling (drop for non-external crawlers unless the
   filetype has ignore_host).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

from ..config import CrawlConfig
from ..functions.canonicalize import (
    ParsedUrl,
    add_url,
    guess_seed_url,
    parse_url,
)
from ..functions.classify import FT, HEAD, FtIndex

# routing outcomes
R_DISCARD = "discard"
R_TARGET = "target"
R_FRONTIER = "frontier"
R_EXTERNAL = "external"  # parked for per-host adoption (EXTERNAL crawlers)


@dataclass
class Admission:
    """One admitted link candidate after canonicalize+classify+route."""

    parsed: ParsedUrl
    route: str
    filetype: Optional[str]
    ft_rank: int
    is_external: bool
    peek_start: bool = False


def route_of(
    ft_name: Optional[str],
    external: bool,
    idx: FtIndex,
    config: CrawlConfig,
    parent_peek: bool = False,
) -> tuple:
    """(route, ft_rank, peek_start) — the bind_url routing
    (worker.c:666-714). peek_start=True when an external URL begins an
    external peek (EPEEK crawler, not already peeking,
    worker.c:679-703)."""
    if ft_name is None:
        return R_DISCARD, len(idx.ft_list), False
    ft = config.filetype(ft_name)
    rank = config.filetype_rank(idx.crawler.name, ft_name)
    if ft.is_target_only:
        return R_TARGET, rank, False
    if external and not ft.ignore_host:
        cr = idx.crawler
        if cr.external_peek and not parent_peek:
            return R_FRONTIER, rank, True
        if cr.external:
            return R_EXTERNAL, rank, False
        return R_DISCARD, rank, False
    return R_FRONTIER, rank, False


def admit_link(
    base: Optional[ParsedUrl],
    href: str,
    idx: FtIndex,
    config: CrawlConfig,
    seen_tryadd: Callable[[str], bool],
    content_type_of: Callable[[str], Optional[str]],
    base_external: bool = False,
    parent_peek: bool = False,
) -> Optional[Admission]:
    """Admit one raw href. Returns None when nothing enters the
    pipeline (bad URL or already seen); an Admission with
    route=R_DISCARD when the URL entered the seen set but was dropped
    by classification (the distinction matters for seen-set parity).

    ``seen_tryadd(key) -> bool`` is the mtrie_tryadd equivalent: True
    when newly added. ``content_type_of(url)`` resolves POSSIBLE_MATCH
    rows (the reference's HEAD request).
    """
    res = add_url(base, href, base_external)
    if res is None:
        return None
    parsed, external = res
    if not seen_tryadd(parsed.seen_key):
        return None  # already crawled or queued

    kind, name = idx.match_by_url(parsed)
    if kind == HEAD:
        mime = content_type_of(parsed.url)
        name = idx.match_by_mime(mime) if mime else None
        kind = FT if name else None
    if kind != FT or name is None:
        return Admission(parsed, R_DISCARD, None, len(idx.ft_list), external)

    route, rank, peek_start = route_of(
        name, external, idx, config, parent_peek
    )
    return Admission(parsed, route, name, rank, external, peek_start)


def admit_seed(
    raw: str,
    idx: FtIndex,
    config: CrawlConfig,
    seen_tryadd: Callable[[str], bool],
    content_type_of: Callable[[str], Optional[str]],
) -> Optional[Admission]:
    """Seed admission (lm_strtourl protocol guessing + ue_add_initial
    + the initial sort, str.c:35-66 / worker.c:238-246): protocol-less
    seeds get file:///ftp:///http:// guessed like the mb CLI; bind
    initial_filetype when the crawler sets one, else classify like any
    URL. Seeds are never external."""
    parsed = parse_url(guess_seed_url(raw))
    if parsed is None:
        return None
    if not seen_tryadd(parsed.seen_key):
        return None
    cr = idx.crawler
    if cr.initial_filetype:
        name = cr.initial_filetype
        ft = config.filetype(name)
        rank = config.filetype_rank(cr.name, name)
        route = R_TARGET if ft.is_target_only else R_FRONTIER
        return Admission(parsed, route, name, rank, False)
    kind, name = idx.match_by_url(parsed)
    if kind == HEAD:
        mime = content_type_of(parsed.url)
        name = idx.match_by_mime(mime) if mime else None
        kind = FT if name else None
    if kind != FT or name is None:
        return Admission(parsed, R_DISCARD, None, len(idx.ft_list), False)
    ft = config.filetype(name)
    rank = config.filetype_rank(cr.name, name)
    route = R_TARGET if ft.is_target_only else R_FRONTIER
    return Admission(parsed, route, name, rank, False)


def _declared_attr(name: str, declared: tuple) -> str:
    """The declared attribute matching a set_attribute name, or ''.

    QUIRK (attr.c:44-47): the declared name matches when it equals the
    set name OR starts with it followed by whitespace — a filetype
    declaring "title from-page" accepts set_attribute("title", ...)
    and reports the value under the full declared name.
    """
    for d in declared:
        if d == name or (
            d.startswith(name) and d[len(name)] in " \t\r\n\f\v"
        ):
            return d
    return ""


def run_parser_chain(
    spans: List[dict], parsers: tuple, declared_attrs: tuple = ()
) -> Tuple[List[str], Dict[str, str]]:
    """Run the filetype's parser chain over an interleaved text+media
    span document (BASELINE.json input_hint shape).

    Text spans feed the chain's text-bearing parsers in span order;
    media spans contribute their media_ref as a link candidate at
    their position (the synthetic-web equivalent of src attributes the
    reference's html parser would see). The span *sequence itself* is
    never altered — the per-row span invariant is preserved upstream.

    Returns (links, attributes): "attrs"-kind parsers additionally set
    named attributes; only names declared on the filetype are kept
    (attr.c:35-60), keyed by the declared name. A non-empty dict is
    the ``attributes.changed`` target signal (worker.c:913-917).
    """
    from ..functions.parsers import resolve_parser

    links: List[str] = []
    attrs: Dict[str, str] = {}
    for span in spans:
        kind = span["kind"] if isinstance(span, dict) else span.kind
        text = span["text"] if isinstance(span, dict) else span.text
        media = span["media_ref"] if isinstance(span, dict) else span.media_ref
        if kind == "media":
            if media:
                links.append(media)
            continue
        if not text:
            continue
        # parser chaining (P9): transform stages rewrite the buffer
        # for later stages; extract stages emit candidate hrefs
        for parser in parsers:
            entry = resolve_parser(parser)
            if entry is None:
                continue
            pkind, fn = entry
            if pkind == "transform":
                text = fn(text)
            elif pkind == "attrs":
                ls, at = fn(text)
                links.extend(ls)
                for k, v in at.items():
                    dk = _declared_attr(k, declared_attrs)
                    if dk:
                        attrs[dk] = v
            else:
                links.extend(fn(text))
    return links, attrs


def extract_links_from_spans(spans: List[dict], parsers: tuple) -> List[str]:
    """Links-only view of ``run_parser_chain`` (the admission path)."""
    return run_parser_chain(spans, parsers)[0]
