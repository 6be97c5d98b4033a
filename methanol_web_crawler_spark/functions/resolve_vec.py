"""Whole-column (vectorized) link resolver — the hot parse stage.

Same semantics as the scalar resolver in ``udfs.make_link_resolver_scalar``
(the reference's per-page flow: worker.c:747-808 redirect handling +
parser chain + ue_add admission), re-expressed as pandas/numpy column
operations so the mapInPandas stage spends its time in C, not in a
Python ``itertuples`` loop:

- redirect rows (3xx + Location) split off with boolean masks — the
  single Location candidate per row is built with column ops;
- link extraction for the builtin html chain runs as ONE compiled-regex
  ``Series.str.extractall`` over all guard-passing span texts (the
  guard proves every tag in the text is a fast-shape tag, so the
  per-char scanner in parsers.py would take its regex fast path on
  every tag anyway); spans failing the guard, and non-html parser
  chains, fall back to the exact per-span scalar machinery;
- URL canonicalization (url.c lm_url_set/lm_url_combine semantics) for
  the overwhelmingly-common shapes — printable-ASCII absolute URLs,
  root-relative and relative hrefs, with or without a "simple" query
  string — is computed with vectorized str ops; anything else (escaped
  bytes, ``..`` pops, ``&amp;`` rewrites, fragments, unknown
  protocols, ports) goes row-by-row through the exact ``add_url``
  state machine;
- classification (ftindex.c decision tree) and routing
  (worker.c:666-714) are memoized over the batch's UNIQUE
  (protocol, ext, dynamic, dir) / (filetype, external, peek) keys —
  exact per-key scalar evaluation, C-speed fan-out. Crawlers with UMEX
  expressions (which match on the full URL, not a finite key) keep the
  exact per-row path.

Equivalence with the scalar resolver is enforced by the differential
fuzz suite (tests/test_resolver_vec_diff.py) on top of the existing
fast-path fuzz (tests/test_fastpath_diff.py) and the golden crawls.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from .canonicalize import MAX_URL_LEN, ParsedUrl, add_url
from .classify import FT, HEAD, FtIndex
from .parsers import _FAST_SKIP, _FAST_TAG
from ..operators.admission import (
    R_DISCARD,
    extract_links_from_spans,
    route_of,
)

# -- link-extraction fast path (whole-column) --------------------------------

# any special-prefixed tag forces the exact scanner (html.c:70-75 +
# the <html xmlns CURIE collector); tag-name matching there is
# prefix-based, so forbidding these four prefixes is exactly
# conservative (no CURIE can ever be declared in a guarded text)
_SPECIAL_ANY_RE = re.compile(r"<(?:script|style|textarea|html)", re.I)
# ONE extraction pass doubles as the guard: every '<' must start a
# FAST_SKIP or FAST_TAG match (the tag patterns cannot contain '<'
# internally — their char classes all exclude it — so matches are
# non-overlapping and each consumes exactly one '<'). A text is
# guard-clean iff its match count equals its '<' count; counting is a
# scan, unlike a replace()-based residue check which would copy the
# whole corpus text per batch.
_EXTRACT_RE = re.compile(
    "<(?:" + _FAST_SKIP.pattern + "|" + _FAST_TAG.pattern + ")"
)

# -- canonicalization fast shapes (whole-column) -----------------------------

# absolute, known protocol, clean host (no port/userinfo); path optional.
# Unlike canonicalize._SIMPLE_ABS_RE users, the path here MAY contain a
# query — queries are handled by the _split_query/_path_fast_ok pair.
_ABS_FULL_RE = re.compile(
    r"^(?i:(https?|ftps?|file))://([A-Za-z0-9.\-]{1,255})"
    r"(/[\x21-\x7f]*)?\Z"
)
# sequences that force the exact byte machine in the pre-'?' region
# ('//' collapse, '/.'-family pops, './' skip, '#' cut — url.c:318-371)
_PATH_UNSAFE_NOQ = r"//|/\.|\./|#"
# rewrites the byte machine applies INSIDE a query ('#' cut, '&amp;'
# -> '&'; ' ' -> '+' is excluded by the printable class already)
_Q_UNSAFE = r"#|&amp;"
_PRINTABLE = r"[\x21-\x7f]*"


def _split_query(href: pd.Series):
    """(pre, query, has_q): split each string at its FIRST '?'."""
    parts = href.str.split("?", n=1)
    pre = parts.str[0]
    query = parts.str[1]  # NaN when no '?'
    has_q = query.notna()
    # an all-NaN column comes back float64; .str needs object/str
    query = query.fillna("").astype(object)
    return pre, query, has_q


def _path_fast_ok(pre: pd.Series, query: pd.Series,
                  has_q: pd.Series) -> pd.Series:
    """True when (pre, query) canonicalizes to itself byte-for-byte."""
    ok = pre.str.fullmatch(_PRINTABLE, na=False) & ~pre.str.contains(
        _PATH_UNSAFE_NOQ, regex=True, na=True
    )
    q_ok = ~has_q | (
        query.str.fullmatch(_PRINTABLE, na=False)
        & ~query.str.contains(_Q_UNSAFE, regex=True, na=True)
    )
    return ok & q_ok


def _hostcmp_vec(ha: pd.Series, hb: pd.Series) -> pd.Series:
    """Vectorized lm_url_hostcmp over LOWERCASED host series (equal, or
    an exact 'www.' 4-char prefix difference — url.c:119-137)."""
    la, lb = ha.str.len(), hb.str.len()
    same = ha == hb
    a_www = (la - lb == 4) & ha.str.startswith("www.") & (
        ha.str[4:] == hb
    )
    b_www = (lb - la == 4) & hb.str.startswith("www.") & (
        hb.str[4:] == ha
    )
    return same | a_www | b_www


def _classify_key(idx: FtIndex, protocol: str, ext: str,
                  is_dynamic: bool, is_dir: bool,
                  has_ext_o: bool = True):
    """match_by_url as a function of its finite key — valid ONLY for
    crawlers with no UMEX expressions (every _umex_scan in
    ftindex.c:141-238 is then empty and the tree depends only on
    (protocol, ext, dynamic-flag, dir-flag, ext_o!=0)). ``has_ext_o``
    is NOT redundant with ``ext``: a trailing-dot URL has ext_o set
    but an EMPTY ext string, and takes the has-extension branches
    (where the empty ext then matches nothing). Mirrors
    FtIndex.match_by_url branch for branch; equivalence is pinned by
    tests/test_resolver_vec_diff.py::test_classify_key_matches_tree."""
    from .classify import _ext_hash

    binding = idx._bindings

    def by_ext():
        if not ext:
            return None
        ext_l = ext.lower()
        for entry, ft_name in idx.e_index[_ext_hash(ext)]:
            if entry[: len(ext_l)] == ext_l:
                return ft_name  # all exprs None -> umex confirm passes
        return None

    def bind(name):
        b = binding[name]
        if b.startswith("@"):
            return (FT, b[1:])
        if b == "lookup":
            return (HEAD, None)
        return (None, None)  # "discard": the umex fallback scan is empty

    if protocol == "ftp":
        if is_dir:
            b = binding["ftp_dir_url"]
            if b.startswith("@"):
                return (FT, b[1:])
            return (None, None)  # QUIRK: lookup AND discard drop
        hit = by_ext()
        return (FT, hit) if hit else (None, None)

    if not has_ext_o:  # ext_o == 0: no file extension
        if is_dynamic:
            return bind("dynamic_url")
        if is_dir:
            return bind("dir_url")
        return bind("extless_url")

    if is_dynamic:
        b = binding["dynamic_url"]
        if b.startswith("@"):
            return (FT, b[1:])
        if b == "lookup":
            return (HEAD, None)
        hit = by_ext()
        return (FT, hit) if hit else (None, None)

    hit = by_ext()
    if hit:
        return (FT, hit)
    return bind("unknown_url")


def has_umex(idx: FtIndex) -> bool:
    return any(u is not None for u in idx.exprs.values())


_OUT_COLS = [
    "url", "host_o", "host_l", "file_o", "ext_o", "protocol",
    "is_dynamic", "www", "seen_key", "host", "external", "needs_head",
    "filetype", "ft_rank", "route", "crawler", "peek", "depth",
    "parent_round", "parent_ord", "sibling_ix", "redirect_count",
]

# working columns of the per-link canonicalization frame
_PARSE_COLS = [
    "url", "host_o", "host_l", "file_o", "ext_o", "protocol",
    "is_dynamic", "www", "external",
]


def _extract_links(pdf, parse_mask, ftcol, ft_parsers):
    """Exploded (rid, span_ix, pos, href) candidate-link frame for the
    parse rows: media refs + html-fast extractall + scalar residue."""
    frames: List[pd.DataFrame] = []
    psub = pdf.loc[parse_mask]
    sp = psub["spans"].explode()
    sp = sp[sp.notna()]
    if not len(sp):
        return frames
    spdf = pd.DataFrame({"rid": sp.index.to_numpy()})
    spdf["span_ix"] = spdf.groupby("rid").cumcount()
    rec = pd.DataFrame(list(sp.to_numpy()))
    spdf["kind"] = rec["kind"].to_numpy()
    spdf["text"] = rec["text"].to_numpy()
    spdf["media_ref"] = rec["media_ref"].to_numpy()

    is_media = spdf["kind"] == "media"
    media = spdf[
        is_media & spdf["media_ref"].notna() & (spdf["media_ref"] != "")
    ]
    if len(media):
        frames.append(
            pd.DataFrame(
                {
                    "rid": media["rid"].to_numpy(),
                    "span_ix": media["span_ix"].to_numpy(),
                    "pos": 0,
                    "href": media["media_ref"].astype(object).to_numpy(),
                }
            )
        )

    textual = spdf[~is_media & spdf["text"].notna() & (spdf["text"] != "")]
    if not len(textual):
        return frames
    # chain per span via ONE dict map + numpy fancy indexing (a
    # per-span .iloc lambda here profiled at ~50% of extraction)
    parsers_by_row = ftcol.map(ft_parsers).to_numpy()
    chains = parsers_by_row[textual["rid"].to_numpy()]
    html_chain = pd.Series(
        [c == ("html",) for c in chains], index=textual.index
    )
    t = textual["text"]
    fast = pd.Series(False, index=textual.index)
    ex = None
    if html_chain.any():
        th = t[html_chain]
        # one extraction pass; guard = (matches consumed every '<')
        # and no special-prefixed tag anywhere
        ex = th.str.extractall(_EXTRACT_RE)
        n_match = (
            ex.groupby(level=0).size()
            if len(ex)
            else pd.Series(dtype="int64")
        )
        n_lt = th.str.count("<")
        guard = (
            n_lt.eq(n_match.reindex(th.index, fill_value=0))
            & ~th.str.contains(
                _SPECIAL_ANY_RE.pattern, case=False, regex=True
            )
        )
        fast.loc[guard.index] = guard

    if ex is not None and len(ex):
        vals = ex[0]
        # keep only matches from guard-passing spans
        ok_rows = fast[vals.index.get_level_values(0)].to_numpy()
        vals = vals[ok_rows]
        vals = vals[
            vals.notna()
            & (vals != "")
            & ~vals.str.startswith("#", na=False)
        ]
        if len(vals):
            lf = vals.reset_index()
            lf.columns = ["span_row", "pos", "href"]
            frames.append(
                pd.DataFrame(
                    {
                        "rid": textual["rid"]
                        .loc[lf["span_row"]].to_numpy(),
                        "span_ix": textual["span_ix"]
                        .loc[lf["span_row"]].to_numpy(),
                        "pos": lf["pos"].to_numpy(),
                        "href": lf["href"].astype(object).to_numpy(),
                    }
                )
            )

    slow_mask = (~fast).to_numpy()
    if slow_mask.any():
        slow = textual[~fast]
        rows = []
        for rid_, six_, kind_, text_, chain_ in zip(
            slow["rid"], slow["span_ix"], slow["kind"], slow["text"],
            chains[slow_mask],
        ):
            links = extract_links_from_spans(
                [
                    {
                        "kind": kind_,
                        "text": text_,
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
                chain_,
            )
            rows.extend(
                (rid_, six_, p_, h_) for p_, h_ in enumerate(links)
            )
        if rows:
            frames.append(
                pd.DataFrame(
                    rows, columns=["rid", "span_ix", "pos", "href"]
                )
            )
    return frames


def make_link_resolver_vec(config: CrawlConfig, default_crawler: str):
    """Vectorized twin of ``make_link_resolver_scalar`` (same contract,
    same CANDIDATE_SCHEMA output, row order within a batch not
    significant — downstream sorts on explicit keys)."""
    from .udfs import build_indexes

    ft_parsers = {f.name: f.parsers for f in config.filetypes}
    ft_switch = {f.name: f.switch_to for f in config.filetypes}

    def resolve(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        indexes = build_indexes(config)
        umex_crawlers = {n for n, ix in indexes.items() if has_umex(ix)}
        classify_memo = {n: {} for n in indexes}
        route_memo = {n: {} for n in indexes}

        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            if not len(pdf):
                yield pd.DataFrame(columns=_OUT_COLS)
                continue

            if "crawler" in pdf.columns:
                cr_col = pdf["crawler"].fillna(default_crawler)
                cr_col = cr_col.where(cr_col != "", default_crawler)
            else:
                cr_col = pd.Series(default_crawler, index=pdf.index)
            peek_col = (
                pdf["peek"].fillna(False).astype(bool)
                if "peek" in pdf.columns
                else pd.Series(False, index=pdf.index)
            )
            ftcol = pdf["filetype"]
            eff_col = ftcol.map(ft_switch)
            eff_col = eff_col.where(eff_col.notna(), cr_col)

            # ---- split: redirect vs parse rows -------------------------
            status = pd.to_numeric(pdf["status"], errors="coerce")
            loc = pdf["location"]
            has_loc = loc.notna() & (loc != "")
            red = (
                status.notna() & (status >= 300) & (status < 400)
                & has_loc
            )
            red_ok = red & (pdf["redirect_count"] + 1 < 20)
            has_parsers = ftcol.map(lambda f: bool(ft_parsers.get(f)))
            parse_mask = ~red & has_parsers & pdf["spans"].notna()

            link_frames: List[pd.DataFrame] = []
            if red_ok.any():
                rsub = pdf.loc[red_ok]
                link_frames.append(
                    pd.DataFrame(
                        {
                            "rid": rsub.index.to_numpy(),
                            "span_ix": -1,
                            "pos": 0,
                            "href": rsub["location"].astype(object)
                            .to_numpy(),
                            "child_depth": rsub["depth"]
                            .astype("int64").to_numpy(),
                            "rcount": (rsub["redirect_count"] + 1)
                            .astype("int64").to_numpy(),
                        }
                    )
                )
            if parse_mask.any():
                link_frames.extend(
                    _extract_links(pdf, parse_mask, ftcol, ft_parsers)
                )
            if not link_frames:
                yield pd.DataFrame(columns=_OUT_COLS)
                continue

            links = pd.concat(link_frames, ignore_index=True)
            # document order: spans in order, matches in order; the
            # scalar resolver's enumerate() becomes a grouped cumcount
            links = links.sort_values(
                ["rid", "span_ix", "pos"], kind="mergesort",
                ignore_index=True,
            )
            links["six"] = links.groupby("rid").cumcount()
            if "child_depth" not in links.columns:
                links["child_depth"] = np.nan
                links["rcount"] = np.nan
            pm = links["child_depth"].isna()
            if pm.any():
                links.loc[pm, "child_depth"] = (
                    pdf["depth"].iloc[links.loc[pm, "rid"]].to_numpy()
                    + 1
                )
                links.loc[pm, "rcount"] = 0
            links["child_depth"] = links["child_depth"].astype("int64")
            links["rcount"] = links["rcount"].astype("int64")

            # ---- base columns fanned out per link ---------------------
            rid = links["rid"].to_numpy()
            base_url = pdf["url"].to_numpy()[rid]
            base_host_o = pdf["host_o"].to_numpy()[rid].astype(np.int64)
            base_host_l = pdf["host_l"].to_numpy()[rid].astype(np.int64)
            base_file_o = pdf["file_o"].to_numpy()[rid].astype(np.int64)
            base_proto = pdf["protocol"].to_numpy()[rid]
            base_www = pdf["www"].to_numpy()[rid].astype(bool)
            base_ident = pdf["host"].to_numpy()[rid]
            base_ext_flag = (
                pdf["external"].fillna(False).astype(bool)
                .to_numpy()[rid]
            )
            eff = eff_col.to_numpy()[rid]
            par_peek = peek_col.to_numpy()[rid]
            par_round = pdf["fetch_round"].to_numpy()[rid]
            par_ord = pdf["fetch_ord"].to_numpy()[rid]

            href = pd.Series(
                links["href"].to_numpy(), dtype=object
            )  # RangeIndex == position
            m = len(links)
            out = pd.DataFrame(
                index=href.index, columns=_PARSE_COLS, dtype=object
            )
            done = np.zeros(m, dtype=bool)
            dropped = np.zeros(m, dtype=bool)

            nonempty = href.notna() & (href != "")
            dropped |= (~nonempty).to_numpy()
            first = href.str[0]

            # lowercased base host, rebuilt from identity + www flag
            # (host_identity strips 'www.' exactly when the flag is set)
            base_host_low = pd.Series(
                np.where(
                    base_www,
                    "www." + pd.Series(base_ident, dtype=object),
                    base_ident,
                ),
                dtype=object,
            )

            # ---- absolute fast shape ----------------------------------
            abs_cand = nonempty & href.str.match(r"[A-Za-z0-9]*:")
            if abs_cand.any():
                g = href[abs_cand].str.extract(_ABS_FULL_RE)
                path = g[2]
                has_path = path.notna()
                pre, query, has_q = _split_query(path.fillna("/"))
                fastA = (
                    g[0].notna()
                    & (~has_path | _path_fast_ok(pre, query, has_q))
                    & (href[abs_cand].str.len() <= MAX_URL_LEN)
                )
                if fastA.any():
                    ix = fastA[fastA].index
                    pos = ix.to_numpy()
                    hv = href.loc[ix]
                    proto = g[0].loc[ix].str.lower()
                    host = g[1].loc[ix]
                    hp = has_path.loc[ix].to_numpy()
                    host_o = (g[0].loc[ix].str.len() + 3).to_numpy()
                    host_l = host.str.len().to_numpy()
                    root = host_o + host_l
                    prepath = pre.loc[ix]
                    fr = prepath.str.rfind("/").to_numpy()
                    er = prepath.str.rfind(".").to_numpy()
                    out.loc[ix, "url"] = np.where(hp, hv, hv + "/")
                    out.loc[ix, "host_o"] = host_o
                    out.loc[ix, "host_l"] = host_l
                    out.loc[ix, "file_o"] = np.where(
                        hp, root + fr, hv.str.len().to_numpy()
                    )
                    out.loc[ix, "ext_o"] = np.where(
                        hp & (er > fr), root + er, 0
                    )
                    out.loc[ix, "protocol"] = proto.to_numpy()
                    out.loc[ix, "is_dynamic"] = (
                        hp & has_q.loc[ix].to_numpy()
                    )
                    out.loc[ix, "www"] = (
                        (host_l > 4)
                        & (host.str[:4].str.lower() == "www.")
                        .to_numpy()
                    )
                    # external: fresh protocol + hostcmp, never inherited
                    out.loc[ix, "external"] = (
                        proto.to_numpy() != base_proto[pos]
                    ) | ~_hostcmp_vec(
                        host.str.lower().reset_index(drop=True),
                        base_host_low.iloc[pos].reset_index(drop=True),
                    ).to_numpy()
                    done[pos] = True

            # ---- relative / root-relative fast shape -------------------
            rel_cand = nonempty & ~abs_cand & (first != ".")
            if rel_cand.any():
                hv0 = href[rel_cand]
                pre, query, has_q = _split_query(hv0)
                safe = _path_fast_ok(pre, query, has_q)
                if safe.any():
                    ix = safe[safe].index
                    pos = ix.to_numpy()
                    hv = href.loc[ix]
                    lead_slash = (first.loc[ix] == "/").to_numpy()
                    root = base_host_o[pos] + base_host_l[pos]
                    cut = np.where(
                        lead_slash, root, base_file_o[pos] + 1
                    )
                    prefix = pd.Series(
                        [u[:c] for u, c in zip(base_url[pos], cut)],
                        index=ix, dtype=object,
                    )
                    good = (
                        (prefix.str.len() + hv.str.len() <= MAX_URL_LEN)
                        & pd.Series(
                            [p.isascii() for p in prefix], index=ix
                        )
                    ).to_numpy()
                    if good.any():
                        ix = ix[good]
                        pos = pos[good]
                        hv = hv.loc[ix]
                        cut = cut[good]
                        lead_slash = lead_slash[good]
                        prefix = prefix.loc[ix]
                        prepath = pre.loc[ix]
                        fr = prepath.str.rfind("/").to_numpy()
                        er = prepath.str.rfind(".").to_numpy()
                        out.loc[ix, "url"] = (prefix + hv).to_numpy()
                        out.loc[ix, "host_o"] = base_host_o[pos]
                        out.loc[ix, "host_l"] = base_host_l[pos]
                        out.loc[ix, "file_o"] = np.where(
                            fr < 0, base_file_o[pos], cut + fr
                        )
                        out.loc[ix, "ext_o"] = np.where(
                            er > fr, cut + er, 0
                        )
                        out.loc[ix, "protocol"] = base_proto[pos]
                        out.loc[ix, "is_dynamic"] = has_q.loc[
                            ix
                        ].to_numpy()
                        out.loc[ix, "www"] = base_www[pos]
                        out.loc[ix, "external"] = base_ext_flag[pos]
                        done[pos] = True

            # ---- exact residue (the scalar state machine) -------------
            resid = ~done & ~dropped
            if resid.any():
                for i in np.flatnonzero(resid):
                    base = ParsedUrl(
                        base_url[i], int(base_host_o[i]),
                        int(base_host_l[i]), int(base_file_o[i]), 0,
                        base_proto[i], False, bool(base_www[i]),
                    )
                    res = add_url(
                        base, href.iloc[i], bool(base_ext_flag[i])
                    )
                    if res is None:
                        dropped[i] = True
                        continue
                    p, external = res
                    out.iloc[i] = [
                        p.url, p.host_o, p.host_l, p.file_o, p.ext_o,
                        p.protocol, p.is_dynamic, p.www_prefix,
                        external,
                    ]
                    done[i] = True

            keep = done & ~dropped
            if not keep.any():
                yield pd.DataFrame(columns=_OUT_COLS)
                continue

            kpos = np.flatnonzero(keep)
            url_a = out["url"].to_numpy()[kpos]
            ho_a = out["host_o"].to_numpy()[kpos].astype(np.int64)
            hl_a = out["host_l"].to_numpy()[kpos].astype(np.int64)
            fo_a = out["file_o"].to_numpy()[kpos].astype(np.int64)
            eo_a = out["ext_o"].to_numpy()[kpos].astype(np.int64)
            proto_a = out["protocol"].to_numpy()[kpos]
            dyn_a = out["is_dynamic"].to_numpy()[kpos].astype(bool)
            www_a = out["www"].to_numpy()[kpos].astype(bool)
            extf_a = out["external"].to_numpy()[kpos].astype(bool)

            seen_key = (
                pd.Series(
                    [u[o:] for u, o in zip(url_a, ho_a)], dtype=object
                ).str.lower().to_numpy()
            )
            host_low = pd.Series(
                [u[o: o + l] for u, o, l in zip(url_a, ho_a, hl_a)],
                dtype=object,
            ).str.lower()
            ident = np.where(
                www_a, host_low.str[4:], host_low
            )

            # ---- classify + route (memoized over unique keys) ----------
            raw_ext = pd.Series(
                [u[e + 1:] if e else "" for u, e in zip(url_a, eo_a)],
                dtype=object,
            )
            ext_a = raw_ext.str.split("?", n=1).str[0].to_numpy()
            url_len = pd.Series(url_a, dtype=object).str.len().to_numpy()
            dir_a = fo_a == url_len - 1
            eff_k = eff[kpos]
            peek_a = par_peek[kpos].astype(bool)

            k = len(kpos)
            kinds = np.empty(k, dtype=object)
            names = np.empty(k, dtype=object)
            routes = np.empty(k, dtype=object)
            ranks = np.empty(k, dtype=object)
            peeks = peek_a.copy()
            depths = links["child_depth"].to_numpy()[kpos].copy()

            for cname in pd.unique(eff_k):
                cm = np.flatnonzero(eff_k == cname)
                idx = indexes[cname]
                cmemo = classify_memo[cname]
                if cname in umex_crawlers:
                    for j in cm:
                        p = ParsedUrl(
                            url_a[j], int(ho_a[j]), int(hl_a[j]),
                            int(fo_a[j]), int(eo_a[j]), proto_a[j],
                            bool(dyn_a[j]), bool(www_a[j]),
                        )
                        kinds[j], names[j] = idx.match_by_url(p)
                else:
                    for j in cm:
                        key = (
                            proto_a[j], ext_a[j], bool(dyn_a[j]),
                            bool(dir_a[j]), bool(eo_a[j]),
                        )
                        hit = cmemo.get(key)
                        if hit is None:
                            hit = cmemo[key] = _classify_key(idx, *key)
                        kinds[j], names[j] = hit
                rmemo = route_memo[cname]
                for j in cm:
                    if kinds[j] == HEAD:
                        routes[j] = None
                        ranks[j] = None
                    elif kinds[j] == FT:
                        rkey = (
                            names[j], bool(extf_a[j]), bool(peek_a[j])
                        )
                        hit = rmemo.get(rkey)
                        if hit is None:
                            hit = rmemo[rkey] = route_of(
                                names[j], bool(extf_a[j]), idx,
                                config, bool(peek_a[j]),
                            )
                        route, rank, peek_start = hit
                        routes[j] = route
                        ranks[j] = rank
                        if peek_start:
                            peeks[j] = True
                            depths[j] = 0
                    else:
                        names[j] = None
                        routes[j] = R_DISCARD
                        ranks[j] = len(idx.ft_list)

            yield pd.DataFrame(
                {
                    "url": url_a,
                    "host_o": ho_a,
                    "host_l": hl_a,
                    "file_o": fo_a,
                    "ext_o": eo_a,
                    "protocol": proto_a,
                    "is_dynamic": dyn_a,
                    "www": www_a,
                    "seen_key": seen_key,
                    "host": ident,
                    "external": extf_a,
                    "needs_head": kinds == HEAD,
                    "filetype": names,
                    "ft_rank": ranks,
                    "route": routes,
                    "crawler": eff_k,
                    "peek": peeks,
                    "depth": depths.astype("int64"),
                    "parent_round": par_round[kpos],
                    "parent_ord": par_ord[kpos],
                    "sibling_ix": links["six"].to_numpy()[kpos]
                    .astype("int64"),
                    "redirect_count": links["rcount"].to_numpy()[kpos],
                }
            )

    return resolve
