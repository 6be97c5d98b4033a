"""The BSP reference crawler — golden oracle for the Spark engine.

A single-threaded, dictionary-based implementation of the crawl
semantics, mirroring the reference's worker loop
(/root/reference/src/libmetha/worker.c:214-920, urlengine.c:110-450)
under the ordering contract of SURVEY.md §7:

- the reference's only reproducible ordering is the single-worker one;
  we normatively re-express it at ROUND granularity (BSP supersteps):
  one round = all eligible URLs at the current minimum depth, subject
  to the per-host politeness budget;
- within a round, fetch order is the deterministic sort key
  (ft_rank, parent_seq, sibling_ix) — filetype-chain priority first
  (north-rule "depth + filetype-chain priority"), then admission
  order;
- politeness-deferred rows keep their sort key and re-enter in order
  on a later round at the same depth;
- admission-time semantics (dedup BEFORE classification, targets
  emitted without fetch, depth-limit rows admitted-but-never-fetched,
  robots fetched once per host on depth-0 entry) follow the reference
  exactly via the shared ``operators.admission`` core.

The Spark engine must match this oracle on: (a) the final seen set
(exact), (b) the per-round fetched sequence (exact, ordered),
(c) targets and metrics. Golden tests enforce this.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ..config import CrawlConfig
from ..functions.canonicalize import ParsedUrl, parse_url
from ..functions.classify import FtIndex
from ..functions.robots import parse_robots, robots_allows
from ..operators.admission import (
    R_DISCARD,
    R_EXTERNAL,
    R_FRONTIER,
    R_TARGET,
    admit_link,
    admit_seed,
    run_parser_chain,
)
from ..sources.synthweb import SynthDoc


@dataclass
class Row:
    parsed: ParsedUrl
    filetype: str
    ft_rank: int
    depth: int
    parent_seq: int
    sibling_ix: int
    redirect_count: int = 0
    external: bool = False
    crawler: str = "default"
    peek: bool = False

    @property
    def sort_key(self):
        return (self.ft_rank, self.parent_seq, self.sibling_ix)


@dataclass
class FetchRecord:
    round: int
    seq: int
    url: str
    filetype: str
    depth: int
    host: str
    status: int


@dataclass
class Target:
    url: str
    filetype: str
    attributes: Dict[str, str]
    round: int


@dataclass
class RoundMetrics:
    round: int
    depth: int
    fetched: int = 0
    admitted: int = 0
    deduped: int = 0
    discarded: int = 0
    targets: int = 0
    deferred: int = 0
    robots_fetches: int = 0
    robots_denied: int = 0


@dataclass
class FileRecord:
    """S9 writefile sink row (builtin.c:63-133)."""

    url: str
    filetype: str
    filename: str
    body: str
    round: int


@dataclass
class CrawlResult:
    seen: Set[str]
    rounds: List[List[FetchRecord]]
    targets: List[Target]
    metrics: List[RoundMetrics]
    files: List[FileRecord] = field(default_factory=list)

    @property
    def fetched_urls(self) -> List[str]:
        return [r.url for rnd in self.rounds for r in rnd]


class OracleCrawler:
    def __init__(
        self,
        doc_map: Dict[str, SynthDoc],
        config: CrawlConfig,
        crawler: str = "default",
        politeness_budget: int = 0,
        max_rounds: int = 10_000,
        serial_transfers: bool = False,
    ):
        self.doc_map = doc_map
        self.config = config
        self.crawler = config.crawler(crawler)
        self.idx = FtIndex(config, self.crawler)
        self.indexes = {c.name: FtIndex(config, c) for c in config.crawlers}
        self.budget = politeness_budget
        self.max_rounds = max_rounds
        # friendly/coward single-synchronous-worker consequence
        # (metha.c:71-79, 957-961): exactly one transfer at a time in
        # fully deterministic global sort order
        self.serial = serial_transfers
        self.robots_enabled = any(c.robotstxt for c in config.crawlers)

    # -- environment lookups ------------------------------------------

    def _content_type_of(self, url: str) -> Optional[str]:
        d = self.doc_map.get(url)
        return d.content_type if d else None

    def _body_of(self, doc: SynthDoc) -> str:
        return "".join(t or "" for (k, t, m, o) in doc.spans if k == "text")

    def _writefile_name(self, p) -> str:
        """The writefile basename + stat()-dedup suffix
        (builtin.c:77-117): last path segment query-stripped,
        ``index.html`` for directory URLs; ``ext_o`` points AT the
        dot (url.c:402) so the extension keeps it; the Nth collision
        becomes ``<stem>-<N><ext>``."""
        url = p.url
        if p.file_o + 1 == len(url):
            stem, ext = "index", ".html"
        else:
            rest = url[p.file_o + 1:]
            q = rest.find("?")
            rest_noq = rest[:q] if q >= 0 else rest
            if p.ext_o:
                stem = url[p.file_o + 1:p.ext_o]
                er = url[p.ext_o:]
                q2 = er.find("?")
                ext = er[:q2] if q2 >= 0 else er
            else:
                stem, ext = rest_noq, ""
        base = stem + ext
        n = self._name_counts.get(base, 0)
        self._name_counts[base] = n + 1
        return base if n == 0 else f"{stem}-{n}{ext}"

    # -- main loop -----------------------------------------------------

    def run(self, seeds: List[str]) -> CrawlResult:
        # S2 init fn: raw args -> seed URLs (mirrors SparkCrawler.run)
        if self.crawler.init:
            from ..functions.parsers import resolve_init

            init_fn = resolve_init(self.crawler.init)
            if init_fn is not None:
                seeds = list(init_fn(seeds))
        seen: Set[str] = set()

        def tryadd(key: str) -> bool:
            if key in seen:
                return False
            seen.add(key)
            return True

        pending: List[Row] = []
        parked: Dict[str, List[Row]] = {}
        hosts: Dict[str, List[Tuple[bool, str]]] = {}  # identity -> rules
        jail: Dict[str, str] = {}  # host identity -> jail dir prefix
        targets: List[Target] = []
        rounds: List[List[FetchRecord]] = []
        metrics: List[RoundMetrics] = []
        files: List[FileRecord] = []
        self._name_counts: Dict[str, int] = {}
        seq = 0
        round_no = 0

        for ix, raw in enumerate(seeds):
            adm = admit_seed(
                raw, self.idx, self.config, tryadd, self._content_type_of
            )
            if adm is None or adm.route == R_DISCARD:
                continue
            if adm.route == R_TARGET:
                targets.append(Target(adm.parsed.url, adm.filetype, {}, 0))
                continue
            pending.append(
                Row(adm.parsed, adm.filetype, adm.ft_rank, 0, -1, ix,
                    crawler=self.crawler.name)
            )

        while round_no < self.max_rounds:
            if not pending:
                if not parked:
                    break
                # host-adoption wave: adopted rows re-enter at depth 0
                # (ue_pop_pending + ue_set_hostent, urlengine.c:623-645)
                for host in sorted(parked):
                    for row in parked[host]:
                        row.depth = 0
                        row.peek = False  # adoption is not a peek
                        pending.append(row)
                parked.clear()
                if not pending:
                    break

            d = min(r.depth for r in pending)
            eligible = sorted(
                (r for r in pending if r.depth == d), key=lambda r: r.sort_key
            )
            rest = [r for r in pending if r.depth != d]

            m = RoundMetrics(round=round_no, depth=d)
            selected: List[Row] = []
            deferred: List[Row] = []
            if self.serial:
                # one synchronous transfer per round (friendly/coward)
                selected = eligible[:1]
                deferred = eligible[1:]
            else:
                per_host: Dict[str, int] = {}
                for r in eligible:
                    h = r.parsed.host_identity
                    if self.budget and per_host.get(h, 0) >= self.budget:
                        deferred.append(r)
                    else:
                        per_host[h] = per_host.get(h, 0) + 1
                        selected.append(r)
            m.deferred = len(deferred)

            this_round: List[FetchRecord] = []
            new_rows: List[Row] = []

            for row in selected:
                host_id = row.parsed.host_identity
                # robots fetch on first depth-0 entry of a host
                # (worker.c:269-283; URL built from the www-stripped
                # host, worker.c:1002-1004)
                if (
                    self.robots_enabled
                    and row.depth == 0
                    and host_id not in hosts
                ):
                    rob = self.doc_map.get(f"http://{host_id}/robots.txt")
                    body = self._body_of(rob) if rob else None
                    hosts[host_id] = parse_robots(
                        body, self.config.user_agent
                    )
                    m.robots_fetches += 1
                row_crawler = self.config.crawler(row.crawler)
                if row_crawler.jail and row.depth == 0:
                    pu = row.parsed
                    jail.setdefault(
                        host_id,
                        pu.url[pu.host_o + pu.host_l : pu.file_o].lower(),
                    )

                # jail gate (worker.c:727-737): dir-region prefix match.
                # BSP contract: the jail prefix is the FIRST depth-0
                # URL's directory per host; depth-0 rows always pass
                # (the reference re-captures jail_url per root pop).
                if row_crawler.jail and row.depth > 0:
                    pu = row.parsed
                    dir_region = pu.url[pu.host_o + pu.host_l : pu.file_o]
                    jp = jail.get(host_id, "")
                    if not dir_region.lower().startswith(jp):
                        continue

                # robots gate: evaluated per fetch (worker.c:739-741)
                rules = hosts.get(host_id)
                if rules and not robots_allows(rules, row.parsed.path):
                    m.robots_denied += 1
                    continue

                # crawler switch (Q4): switch_to applies before the
                # handler, so it covers redirects too (worker.c:747)
                row_ft = self.config.filetype(row.filetype)
                eff_name = row_ft.switch_to or row.crawler
                eff = self.config.crawler(eff_name)
                idx = self.indexes[eff_name]

                doc = self.doc_map.get(row.parsed.url)
                status = doc.status if doc else 404
                rec = FetchRecord(
                    round=round_no,
                    seq=seq,
                    url=row.parsed.url,
                    filetype=row.filetype,
                    depth=row.depth,
                    host=host_id,
                    status=status,
                )
                this_round.append(rec)
                my_seq = seq
                seq += 1
                m.fetched += 1

                if doc is None:
                    continue

                # redirects (worker.c:799-832): same-host -> re-admit at
                # the same depth; other host -> park (EXTERNAL) or drop
                if 300 <= doc.status < 400 and doc.location:
                    if row.redirect_count + 1 >= 20:
                        continue
                    # Location resolved like any link (absolute or
                    # relative), then re-admitted at the same depth
                    adm = admit_link(
                        row.parsed, doc.location, idx,
                        self.config, tryadd, self._content_type_of,
                        parent_peek=row.peek,
                    )
                    if adm is None:
                        m.deduped += 1
                        continue
                    # the redirect target consumed a seen-set slot:
                    # count it as admitted, same as the engine's
                    # seen-delta-cardinality semantics
                    m.admitted += 1
                    if adm.route == R_FRONTIER:
                        depth = 0 if adm.peek_start else row.depth
                        new_rows.append(
                            Row(
                                adm.parsed, adm.filetype, adm.ft_rank,
                                depth, my_seq, 0,
                                row.redirect_count + 1, adm.is_external,
                                eff_name, row.peek or adm.peek_start,
                            )
                        )
                    elif adm.route == R_TARGET:
                        targets.append(
                            Target(adm.parsed.url, adm.filetype, {},
                                   round_no)
                        )
                        m.targets += 1
                    elif adm.route == R_EXTERNAL:
                        parked.setdefault(
                            adm.parsed.host_identity, []
                        ).append(
                            Row(adm.parsed, adm.filetype, adm.ft_rank,
                                0, my_seq, 0,
                                row.redirect_count + 1, True, eff_name)
                        )
                    else:
                        m.discarded += 1
                    continue

                ft = row_ft
                if not ft.parsers:
                    continue
                spans_in = [
                    {"kind": k, "text": t, "media_ref": mr, "offset": o}
                    for (k, t, mr, o) in doc.spans
                ]
                buf_body = None  # the parse buffer, when swapped
                if ft.handler == "writefile":
                    # S9: save under a dedup-suffixed basename and
                    # swap the parse buffer to the FILENAME
                    # (builtin.c:63-133, h->buf swap at 123-126)
                    fname = self._writefile_name(row.parsed)
                    files.append(
                        FileRecord(
                            row.parsed.url, row.filetype, fname,
                            self._body_of(doc), round_no,
                        )
                    )
                    spans_in = [
                        {"kind": "text", "text": fname,
                         "media_ref": None, "offset": 0}
                    ]
                    buf_body = fname
                links, set_attrs = run_parser_chain(
                    spans_in,
                    ft.parsers,
                    ft.attributes,
                )
                for six, href in enumerate(links):
                    adm = admit_link(
                        row.parsed, href, idx, self.config,
                        tryadd, self._content_type_of,
                        base_external=row.external,
                        parent_peek=row.peek,
                    )
                    if adm is None:
                        m.deduped += 1
                        continue
                    m.admitted += 1
                    if adm.route == R_DISCARD:
                        m.discarded += 1
                    elif adm.route == R_TARGET:
                        targets.append(
                            Target(adm.parsed.url, adm.filetype, {},
                                   round_no)
                        )
                        m.targets += 1
                    elif adm.route == R_EXTERNAL:
                        parked.setdefault(
                            adm.parsed.host_identity, []
                        ).append(
                            Row(adm.parsed, adm.filetype, adm.ft_rank,
                                0, my_seq, six, 0, True, eff_name)
                        )
                    else:  # frontier
                        child_peek = row.peek or adm.peek_start
                        child_depth = (
                            0 if adm.peek_start else row.depth + 1
                        )
                        # per-row depth budget: peek rows use the
                        # crawler's peek_limit; the over-limit child
                        # stays in the seen set but never fetches
                        if child_peek:
                            if child_depth >= eff.peek_limit:
                                continue
                        elif eff.depth_limit and (
                            child_depth >= eff.depth_limit
                        ):
                            continue
                        new_rows.append(
                            Row(adm.parsed, adm.filetype, adm.ft_rank,
                                child_depth, my_seq, six, 0,
                                adm.is_external, eff_name, child_peek)
                        )

                # attribute emission (P11): the builtin html parser
                # sets the whole-body 'html' attribute when declared
                # (html.c:179-183); "attrs"-kind parsers set named
                # attributes (js.c:305-330). One target per fetched
                # doc when any attribute changed (worker.c:913-917).
                doc_attrs = {}
                if "html" in ft.attributes and "html" in ft.parsers:
                    # the attribute reads the parse BUFFER — for
                    # writefile rows that is the swapped-in filename
                    doc_attrs["html"] = (
                        buf_body if buf_body is not None
                        else self._body_of(doc)
                    )
                doc_attrs.update(set_attrs)
                if doc_attrs:
                    targets.append(
                        Target(
                            row.parsed.url, row.filetype,
                            doc_attrs, round_no,
                        )
                    )
                    m.targets += 1

            rounds.append(this_round)
            metrics.append(m)
            pending = deferred + rest + new_rows
            round_no += 1

        return CrawlResult(
            seen=seen, rounds=rounds, targets=targets, metrics=metrics,
            files=files,
        )
