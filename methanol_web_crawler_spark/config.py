"""Crawl configuration model: filetypes and crawlers.

Re-expresses the reference's config object graph
(/root/reference/src/libmetha/filetype.h:61-103, crawler.h:38-70,
conf/*.conf) as plain Python dataclasses. Configs are tiny and are
broadcast to executors; the ``.conf`` grammar itself is not ported —
configs are inputs that we restate as Python literals.

URL-binding fallbacks (``dynamic_url``/``extless_url``/``dir_url``/
``unknown_url``/``ftp_dir_url``) take the reference's three-valued
form (ftindex.h:56-73, resolved at metha.c:1118-1170):

- ``"lookup"``  -> POSSIBLE_MATCH: resolve via HTTP HEAD (content-type)
- ``"discard"`` -> drop the URL
- ``"@<name>"`` -> bind to that filetype directly
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

LOOKUP = "lookup"
DISCARD = "discard"


@dataclass(frozen=True)
class Filetype:
    """One filetype config (filetype.h:61-103)."""

    name: str
    extensions: Tuple[str, ...] = ()
    mimetypes: Tuple[str, ...] = ()
    expr: Optional[str] = None  # UMEX pattern, e.g. "PATH</search?*q=*>"
    parsers: Tuple[str, ...] = ()  # parser chain, e.g. ("html",)
    handler: Optional[str] = None
    attributes: Tuple[str, ...] = ()
    switch_to: Optional[str] = None  # crawler name to switch to
    ignore_host: bool = False

    @property
    def is_target_only(self) -> bool:
        """True when the filetype has no parser chain.

        The reference emits such URLs as targets at *sort* time without
        fetching them (worker.c:675-714: FT_FLAG_HAS_HANDLER is never
        set anywhere — a preserved quirk — so handler-only filetypes
        are effectively targets too).
        """
        return not self.parsers


@dataclass(frozen=True)
class Crawler:
    """One crawl policy (crawler.h:38-70)."""

    name: str
    filetypes: Tuple[str, ...] = ()
    depth_limit: int = 0  # 0 = unlimited (urlengine.c:385-390)
    peek_limit: int = 1
    external: bool = False
    external_peek: bool = False  # EPEEK
    jail: bool = False
    robotstxt: bool = False
    spread_workers: bool = False
    initial_filetype: Optional[str] = None
    default_handler: Optional[str] = None
    init: Optional[str] = None  # S2 init fn name (crawler.h init)
    # URL-binding fallbacks; "lookup" is the reference default
    dynamic_url: str = LOOKUP
    extless_url: str = LOOKUP
    dir_url: str = LOOKUP
    unknown_url: str = LOOKUP
    ftp_dir_url: str = LOOKUP


@dataclass(frozen=True)
class CrawlConfig:
    """A full prepared config: named filetypes + crawlers.

    ``filetype_rank`` mirrors the filetype-chain priority of the north
    rule: the index of a filetype within its crawler's ``filetypes``
    tuple orders URLs inside a round (SURVEY.md §2.4 Q8).
    """

    filetypes: Tuple[Filetype, ...]
    crawlers: Tuple[Crawler, ...]
    user_agent: str = "Methanol-Spark/0.1"

    def filetype(self, name: str) -> Filetype:
        return self._ft_map[name]

    def crawler(self, name: str) -> Crawler:
        return self._cr_map[name]

    @property
    def _ft_map(self) -> Dict[str, Filetype]:
        object.__setattr__(
            self, "__ft_cache", getattr(self, "__ft_cache", None)
            or {f.name: f for f in self.filetypes},
        )
        return getattr(self, "__ft_cache")

    @property
    def _cr_map(self) -> Dict[str, Crawler]:
        object.__setattr__(
            self, "__cr_cache", getattr(self, "__cr_cache", None)
            or {c.name: c for c in self.crawlers},
        )
        return getattr(self, "__cr_cache")

    def filetype_rank(self, crawler: str, ft_name: str) -> int:
        cr = self.crawler(crawler)
        try:
            return cr.filetypes.index(ft_name)
        except ValueError:
            return len(cr.filetypes)

    def validate(self) -> None:
        names = {f.name for f in self.filetypes}
        crawler_names = {c.name for c in self.crawlers}
        for c in self.crawlers:
            for ft in c.filetypes:
                assert ft in names, f"crawler {c.name}: unknown filetype {ft}"
            for b in (c.dynamic_url, c.extless_url, c.dir_url,
                      c.unknown_url, c.ftp_dir_url):
                assert b in (LOOKUP, DISCARD) or (
                    b.startswith("@") and b[1:] in names
                ), f"crawler {c.name}: bad binding {b!r}"
            if c.initial_filetype:
                assert c.initial_filetype in names
        for f in self.filetypes:
            if f.switch_to:
                assert f.switch_to in crawler_names, (
                    f"filetype {f.name}: unknown crawler {f.switch_to}"
                )


def default_config(**crawler_overrides) -> CrawlConfig:
    """The semantics of conf/default.conf: html+text crawl.

    crawler ["default"] { dir_url = extless_url = dynamic_url = "@html";
    unknown_url = "discard"; } — any override kwargs are applied to the
    crawler (e.g. depth_limit=3, robotstxt=True).
    """
    html = Filetype(
        name="html",
        extensions=("htm", "html", "php", "asp", "aspx", "jsp"),
        mimetypes=(
            "text/html",
            "text/xml",
            "application/xhtml+xml",
            "application/xml",
        ),
        parsers=("html",),
    )
    text = Filetype(
        name="text",
        extensions=("txt",),
        mimetypes=("text/plain",),
        parsers=("text",),
    )
    base = dict(
        name="default",
        filetypes=("html", "text"),
        dynamic_url="@html",
        extless_url="@html",
        dir_url="@html",
        unknown_url=DISCARD,
    )
    base.update(crawler_overrides)
    cfg = CrawlConfig(filetypes=(html, text), crawlers=(Crawler(**base),))
    cfg.validate()
    return cfg


def _extend_html(cfg_fn_doc_name, parsers, attributes, **crawler_overrides):
    """Shared shape of conf/title.conf & conf/meta.conf:

        include "default.conf"
        extend: filetype["html"] { parser = "xmlconv, misc.js/<fn>"; }

    The ``extend`` directive keeps default.conf's html filetype and
    overrides its parser chain (methanol.texinfo:700-730). The
    reference's misc.js parsers print to stdout; a distributed engine
    has no per-document stdout, so the analogs route the extracted
    values through DECLARED attributes instead (the engine's target
    data path, methanol.texinfo:148-154) — hence the attributes
    declaration the .conf files themselves don't need."""
    cfg = default_config(**crawler_overrides)
    fts = tuple(
        Filetype(
            name=f.name,
            extensions=f.extensions,
            mimetypes=f.mimetypes,
            expr=f.expr,
            parsers=parsers,
            handler=f.handler,
            attributes=attributes,
            switch_to=f.switch_to,
            ignore_host=f.ignore_host,
        )
        if f.name == "html"
        else f
        for f in cfg.filetypes
    )
    cfg = CrawlConfig(filetypes=fts, crawlers=cfg.crawlers)
    cfg.validate()
    return cfg


def title_config(**crawler_overrides) -> CrawlConfig:
    """conf/title.conf analog: html pages re-parsed through
    xmlconv -> misc.js/title; each fetched page emits a target with
    its <title> as the declared "title" attribute."""
    return _extend_html(
        "title", ("xmlconv", "misc.js/title"), ("title",),
        **crawler_overrides,
    )


def meta_config(**crawler_overrides) -> CrawlConfig:
    """conf/meta.conf analog: html pages re-parsed through
    xmlconv -> misc.js/meta; declared attributes collect <meta>
    name/content pairs."""
    return _extend_html(
        "meta", ("xmlconv", "misc.js/meta"),
        ("description", "keywords", "author"),
        **crawler_overrides,
    )


def writefile_config(**crawler_overrides) -> CrawlConfig:
    """html crawl whose html filetype binds the S9 writefile handler:
    every fetched page is saved under a dedup-suffixed basename and
    the parser chain receives the FILENAME (builtin.c:63-133)."""
    base = default_config(**crawler_overrides)
    fts = tuple(
        Filetype(
            name=f.name, extensions=f.extensions,
            mimetypes=f.mimetypes, expr=f.expr, parsers=f.parsers,
            handler="writefile" if f.name == "html" else f.handler,
            attributes=f.attributes, switch_to=f.switch_to,
            ignore_host=f.ignore_host,
        )
        for f in base.filetypes
    )
    cfg = CrawlConfig(filetypes=fts, crawlers=base.crawlers)
    cfg.validate()
    return cfg


def media_config(**crawler_overrides) -> CrawlConfig:
    """html crawl + image/audio/video target filetypes.

    Mirrors conf/image.conf / audio.conf / video.conf: media filetypes
    have no parser, so they are emitted as targets at sort time without
    a fetch. Their mimetypes entries like "image/" never match real
    content types (exact-string mime lookup quirk, mime.c:226-241) —
    they effectively match by extension only, which we preserve.
    """
    html = Filetype(
        name="html",
        extensions=("htm", "html", "php", "asp", "aspx", "jsp"),
        mimetypes=("text/html", "application/xhtml+xml"),
        parsers=("html",),
    )
    css = Filetype(
        name="css",
        extensions=("css",),
        mimetypes=("text/css",),
        parsers=("css",),
    )
    image = Filetype(
        name="image",
        extensions=("jpg", "jpeg", "gif", "png", "bmp", "svg", "webp"),
        mimetypes=("image/",),  # QUIRK: exact-match -> never matches
    )
    audio = Filetype(
        name="audio",
        extensions=("mp3", "ogg", "wav", "flac", "m4a"),
        mimetypes=("audio/",),
    )
    video = Filetype(
        name="video",
        extensions=("mp4", "avi", "mkv", "webm", "mov"),
        mimetypes=("video/",),
    )
    base = dict(
        name="media",
        filetypes=("html", "css", "image", "audio", "video"),
        dynamic_url="@html",
        extless_url="@html",
        dir_url="@html",
        unknown_url=DISCARD,
    )
    base.update(crawler_overrides)
    cfg = CrawlConfig(
        filetypes=(html, css, image, audio, video),
        crawlers=(Crawler(**base),),
    )
    cfg.validate()
    return cfg


# The reference's politeness modes (metha.c:71-79: aggressive = 0s
# between transfers, friendly = 10s GET / 2s HEAD forcing a single
# synchronous worker, coward = 30s/5s) re-expressed as per-host
# per-round fetch budgets — the BSP analog of inter-transfer waits
# (SURVEY.md §2.4 Q10). 0 = unlimited.
POLITENESS_MODES = {
    "aggressive": 0,
    "friendly": 6,
    "coward": 2,
}


def politeness_budget_for(mode: str) -> int:
    return POLITENESS_MODES[mode]
