"""``.conf`` loader — the libmethaconfig grammar over CrawlConfig.

Re-implements the reference's single-pass character machine
(src/libmethaconfig/conf.c:267-798) against the same option tables
(src/libmetha/metha.c:132-186), so the reference's shipped
``conf/*.conf`` files load directly as engine configs.

Grammar:
  include "file"                     — directive (metha.c:1425, path
                                       resolved against search dirs)
  load_module "file"                 — accepted, recorded, not loaded
  crawler ["name"] { opt = v; ... }  — define (constructor defaults,
                                       crawler.c:36-49: depth_limit=1)
  filetype ["name"] { ... }
  filetype ["a" copy "b"] { ... }    — copy b's settings into a
  extend:   <class>["name"] {...}    — modify existing (error if
                                       missing, conf.c:494-499)
  override: <class>["name"] {...}    — zero_cb then modify
Values: "string", {"array", ...}, uint digits, flags (true/false/uint).
Comments: ``#`` to end of line, ``/* ... */``. Strings have no escapes.

Preserved reference quirks (each cited):
- class tokens match by PREFIX: ``file["x"]`` selects class
  "filetype" (conf.c:341 ``strncmp(p, name, token_len)``).
- a ``;`` right after the name (no body) never registers a NEW
  object: add_cb runs only at '}' (conf.c:552-566); and the
  extend/override flags are reset only at '}' too, so they LEAK into
  the next statement after a ';' form (conf.c:567-569).
- flag ``false`` is a no-op — the flag is never cleared
  (conf.c:702-703 "TODO: set flag to 0").
- filetype ``copy`` does NOT copy the parser chain: lm_filetype_dup
  (filetype.c:117-163) copies the prepared parser_chain but not
  parser_str, and at config time the chain is still empty.
- filetype clear/override preserves ``handler`` (lm_filetype_clear,
  filetype.c:75-114, never touches handler).
- crawler clear/override preserves the five URL bindings and
  default_handler (lm_crawler_clear, crawler.c:114-140) while
  resetting flags, peek_limit and depth_limit(=1).
- crawler ``copy`` copies filetypes/flags/init/bindings/
  initial_filetype/peek_limit but NOT depth_limit or default_handler
  (lm_crawler_dup, crawler.c:66-107).
- a crawler with no ``filetypes`` list gets ALL defined filetypes in
  definition order (metha.c:1022-1031).
- unset URL bindings default to "lookup" (metha.c:1152-1157).
- parser chains split on spaces/tabs/newlines/commas
  (metha.c:1226 ``strtok(parser_str, " \\n\\t,")``).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .config import Crawler, CrawlConfig, Filetype, LOOKUP


class ConfError(ValueError):
    """Syntax or semantic error, message shaped like conf.c set_error."""


@dataclass
class _FtBuilder:
    """Mutable mirror of filetype_t during config load."""

    name: str
    extensions: List[str] = field(default_factory=list)
    mimetypes: List[str] = field(default_factory=list)
    parser_str: Optional[str] = None
    handler: Optional[str] = None
    expr: Optional[str] = None
    switch_to: Optional[str] = None
    attributes: List[str] = field(default_factory=list)
    ignore_host: bool = False

    def clear(self):
        # lm_filetype_clear (filetype.c:75-114): handler survives
        self.expr = None
        self.extensions = []
        self.mimetypes = []
        self.attributes = []
        self.parser_str = None
        self.switch_to = None
        self.ignore_host = False

    def copy_from(self, src: "_FtBuilder"):
        # lm_filetype_dup (filetype.c:117-163): parser_str NOT copied
        self.clear()
        self.extensions = list(src.extensions)
        self.mimetypes = list(src.mimetypes)
        self.attributes = list(src.attributes)
        self.expr = src.expr
        self.switch_to = src.switch_to
        self.handler = src.handler
        self.ignore_host = src.ignore_host


@dataclass
class _CrBuilder:
    """Mutable mirror of crawler_t during config load."""

    name: str
    filetypes: List[str] = field(default_factory=list)
    depth_limit: int = 1  # lm_crawler_create, crawler.c:47
    peek_limit: int = 0
    external: bool = False
    jail: bool = False
    robotstxt: bool = False
    spread_workers: bool = False
    init: Optional[str] = None
    initial_filetype: Optional[str] = None
    default_handler: Optional[str] = None
    dynamic_url: Optional[str] = None  # None = unset -> "lookup"
    extless_url: Optional[str] = None
    dir_url: Optional[str] = None
    unknown_url: Optional[str] = None
    ftp_dir_url: Optional[str] = None

    def clear(self):
        # lm_crawler_clear (crawler.c:114-140): bindings and
        # default_handler survive; flags/depth/peek reset
        self.filetypes = []
        self.init = None
        self.initial_filetype = None
        self.external = self.jail = False
        self.robotstxt = self.spread_workers = False
        self.peek_limit = 0
        self.depth_limit = 1

    def copy_from(self, src: "_CrBuilder"):
        # lm_crawler_dup (crawler.c:66-107): calls lm_crawler_clear
        # first — so the DEST's depth_limit resets to 1 (crawler.c:139)
        # and is never copied from the source; only default_handler
        # survives the clear (it is not touched by clear or dup)
        kept_handler = self.default_handler
        self.clear()
        self.default_handler = kept_handler
        self.filetypes = list(src.filetypes)
        self.external = src.external
        self.jail = src.jail
        self.robotstxt = src.robotstxt
        self.spread_workers = src.spread_workers
        self.init = src.init
        self.initial_filetype = src.initial_filetype
        self.dynamic_url = src.dynamic_url
        self.dir_url = src.dir_url
        self.extless_url = src.extless_url
        self.unknown_url = src.unknown_url
        self.ftp_dir_url = src.ftp_dir_url
        self.peek_limit = src.peek_limit


# option tables (metha.c:143-186): name -> (type, setter)
_S, _A, _U, _F = "string", "array", "uint", "flag"
_FT_OPTS = {
    "extensions": (_A, "extensions"),
    "mimetypes": (_A, "mimetypes"),
    "parser": (_S, "parser_str"),
    "handler": (_S, "handler"),
    "expr": (_S, "expr"),  # LMC_OPT_EXTRA takes a quoted string too
    "crawler_switch": (_S, "switch_to"),
    "attributes": (_A, "attributes"),
    "ignore_host": (_F, "ignore_host"),
}
_CR_OPTS = {
    "filetypes": (_A, "filetypes"),
    "dynamic_url": (_S, "dynamic_url"),
    "extless_url": (_S, "extless_url"),
    "unknown_url": (_S, "unknown_url"),
    "dir_url": (_S, "dir_url"),
    "ftp_dir_url": (_S, "ftp_dir_url"),
    "external": (_F, "external"),
    "external_peek": (_U, "peek_limit"),
    "depth_limit": (_U, "depth_limit"),
    "initial_filetype": (_S, "initial_filetype"),
    "init": (_S, "init"),
    "spread_workers": (_F, "spread_workers"),
    "jail": (_F, "jail"),
    "robotstxt": (_F, "robotstxt"),
    "default_handler": (_S, "default_handler"),
}


class ConfLoader:
    """Accumulates objects across files (include chains), then
    ``build()`` resolves them into a CrawlConfig the way
    lmetha_prepare does (metha.c:933-1180)."""

    def __init__(self, conf_dirs: Tuple[str, ...] = ()):
        self.conf_dirs = tuple(conf_dirs)
        self.filetypes: List[_FtBuilder] = []
        self.crawlers: List[_CrBuilder] = []
        self.modules: List[str] = []
        self._loaded: List[str] = []

    # -- object registry (find_cb/add_cb analogs) ----------------------

    def _find(self, cls: str, name: str):
        objs = self.filetypes if cls == "filetype" else self.crawlers
        for o in objs:
            if o.name == name:
                return o
        return None

    def _add(self, cls: str, obj):
        (self.filetypes if cls == "filetype" else self.crawlers).append(obj)

    # -- directives ----------------------------------------------------

    def load_file(self, path: str) -> "ConfLoader":
        """lmc_parse_file + the include directive's path search
        (metha.c:1425-1460): absolute paths as-is, else each conf dir,
        else relative to the including file's directory."""
        full = self._resolve(path)
        with open(full, "r") as f:
            text = f.read()
        self._loaded.append(full)
        try:
            self._parse(text, os.path.basename(full))
        finally:
            self._loaded.pop()
        return self

    def _resolve(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        for d in self.conf_dirs:
            cand = os.path.join(d, path)
            if os.path.exists(cand):
                return cand
        if self._loaded:
            cand = os.path.join(os.path.dirname(self._loaded[-1]), path)
            if os.path.exists(cand):
                return cand
        return path  # let open() raise

    def load_string(self, text: str, name: str = "<string>") -> "ConfLoader":
        self._parse(text, name)
        return self

    # -- the parser (conf.c:267-798) -----------------------------------

    def _parse(self, buf: str, name: str) -> None:
        pos = 0
        n = len(buf)
        extend = override = False
        cls = None  # "filetype" | "crawler"
        obj = None
        is_new = False

        def err(msg, at):
            line = buf.count("\n", 0, at) + 1
            raise ConfError(f"<{name}:{line}>: {msg}")

        def skip_ws_comments(p):
            while p < n:
                c = buf[p]
                if c.isspace():
                    p += 1
                elif c == "#":
                    nl = buf.find("\n", p)
                    p = n if nl < 0 else nl + 1
                elif c == "/" and p + 1 < n and buf[p + 1] == "*":
                    end = buf.find("*/", p + 2)
                    p = n if end < 0 else end + 2
                else:
                    break
            return p

        def read_string(p):
            # conf.c:409-419 — '"' already consumed by caller
            t = p
            while t < n and buf[t] not in '"\n':
                t += 1
            if t >= n or buf[t] == "\n":
                err("unterminated string constant", p)
            return buf[p:t], t + 1

        _tok = re.compile(r"[A-Za-z0-9_]*")
        _opt_tok = re.compile(r"[A-Za-z0-9_-]*")

        while True:
            pos = skip_ws_comments(pos)
            if pos >= n:
                break
            # STATE_ROOT
            m = _tok.match(buf, pos)
            word = m.group(0)
            if not word:
                err(f"unexpected char '{buf[pos]}'", pos)
            if word == "extend" or word == "override":
                pos = m.end()
                if pos >= n or buf[pos] != ":":
                    err(f"expected ':' after {word} keyword", pos)
                pos += 1
                extend = True
                override = word == "override"
                continue
            # directives — PREFIX match like classes (conf.c:392-393
            # strncmp over the TOKEN length: "inc" matches "include")
            directive = next(
                (d for d in ("include", "load_module")
                 if d.startswith(word)),
                None,
            )
            if directive is not None:
                pos = skip_ws_comments(m.end())
                if pos >= n or buf[pos] != '"':
                    err(f"expected a quoted argument for directive"
                        f" '{word}'", pos)
                arg, pos = read_string(pos + 1)
                if directive == "include":
                    self.load_file(arg)
                else:
                    self.modules.append(arg)
                continue
            # classes — PREFIX match quirk (conf.c:341)
            cls = None
            for cand in ("filetype", "crawler"):
                if cand.startswith(word):
                    cls = cand
                    break
            if cls is None:
                err(f"unexpected char '{buf[pos]}'", pos)
            pos = m.end()

            # STATE_PRE_NAME
            pos = skip_ws_comments(pos)
            if pos >= n or buf[pos] != "[":
                err(f"expected '[', found "
                    f"'{buf[pos] if pos < n else ''}'", pos)
            pos = skip_ws_comments(pos + 1)
            if pos >= n or buf[pos] != '"':
                err(f"expected quoted {cls} name", pos)
            objname, pos = read_string(pos + 1)
            if not objname:
                err(f"empty {cls} name", pos)

            if not extend:
                obj = (_FtBuilder(objname) if cls == "filetype"
                       else _CrBuilder(objname))
                is_new = True
            else:
                obj = self._find(cls, objname)
                if obj is None:
                    err(f"undefined {cls} '{objname}'", pos)
                if override:
                    obj.clear()
                is_new = False

            # STATE_POST_NAME: optional `copy "other"`
            pos = skip_ws_comments(pos)
            if buf.startswith("copy", pos):
                pos = skip_ws_comments(pos + 4)
                if pos >= n or buf[pos] != '"':
                    err(f"expected quoted {cls} name", pos)
                srcname, pos = read_string(pos + 1)
                src = self._find(cls, srcname)
                if src is None:
                    err(f"undefined {cls} '{srcname}'", pos)
                obj.copy_from(src)
                pos = skip_ws_comments(pos)
            if pos >= n or buf[pos] != "]":
                err(f"unexpected char '{buf[pos] if pos < n else ''}'",
                    pos)
            pos = skip_ws_comments(pos + 1)

            # STATE_PRE_OBJ: '{' body or bare ';'
            if pos < n and buf[pos] == ";":
                # QUIRK (conf.c:540-544,567-569): a new object is
                # dropped (add_cb only runs at '}') and the
                # extend/override flags are NOT reset here — they leak
                # into the next statement.
                pos += 1
                continue
            if pos >= n or buf[pos] != "{":
                err(f"expected '{{' or ';', found "
                    f"'{buf[pos] if pos < n else ''}'", pos)
            pos += 1

            # STATE_OBJ
            opts = _FT_OPTS if cls == "filetype" else _CR_OPTS
            while True:
                pos = skip_ws_comments(pos)
                if pos >= n:
                    err("unexpected end of file", pos - 1)
                if buf[pos] == "}":
                    pos += 1
                    if is_new:
                        self._add(cls, obj)
                    extend = override = False
                    break
                om = _opt_tok.match(buf, pos)
                oname = om.group(0)
                if oname not in opts:
                    err(f"unknown option '{oname or buf[pos]}'", pos)
                typ, attr = opts[oname]
                pos = skip_ws_comments(om.end())
                if pos >= n or buf[pos] != "=":
                    err(f"expected '=', found "
                        f"'{buf[pos] if pos < n else ''}'", pos)
                pos = skip_ws_comments(pos + 1)
                if pos >= n:
                    err("unexpected end of file", pos - 1)
                c = buf[pos]
                if c == "{":
                    if typ != _A:
                        err(f"option '{oname}' expects {typ}", pos)
                    vals = []
                    pos += 1
                    while True:
                        pos = skip_ws_comments(pos)
                        if pos < n and buf[pos] == "}":
                            pos += 1
                            break
                        if pos >= n or buf[pos] != '"':
                            err("unexpected char in array", pos)
                        v, pos = read_string(pos + 1)
                        vals.append(v)
                        pos = skip_ws_comments(pos)
                        if pos < n and buf[pos] == ",":
                            pos += 1
                        elif pos < n and buf[pos] == "}":
                            pos += 1
                            break
                        else:
                            err("unexpected char in array", pos)
                    setattr(obj, attr, vals)
                elif c == '"':
                    if typ != _S:
                        err(f"option '{oname}' expects {typ}", pos)
                    v, pos = read_string(pos + 1)
                    setattr(obj, attr, v)
                elif c.isdigit():
                    num = re.match(r"\d+", buf[pos:]).group(0)
                    if typ == _U:
                        setattr(obj, attr, int(num))
                    elif typ == _F:
                        if int(num):
                            setattr(obj, attr, True)
                    else:
                        err(f"option '{oname}' expects {typ}", pos)
                    pos += len(num)
                else:
                    if typ != _F:
                        err(f"expected {typ}, found '{c}'", pos)
                    if buf[pos:pos + 4].lower() == "true":
                        setattr(obj, attr, True)
                        pos += 4
                    elif buf[pos:pos + 5].lower() == "false":
                        # QUIRK: false never clears (conf.c:702-703)
                        pos += 5
                    else:
                        err(f"expected flag, found '{c}'", pos)
                pos = skip_ws_comments(pos)
                if pos >= n or buf[pos] != ";":
                    err(f"expected ';', found "
                        f"'{buf[pos] if pos < n else ''}'", pos)
                pos += 1

    # -- prepare (metha.c:933-1180) ------------------------------------

    def build(self, user_agent: str = "Methanol-Spark/0.1") -> CrawlConfig:
        fts = tuple(
            Filetype(
                name=b.name,
                extensions=tuple(b.extensions),
                mimetypes=tuple(b.mimetypes),
                expr=b.expr,
                parsers=tuple(
                    p for p in re.split(r"[ \n\t,]+", b.parser_str or "")
                    if p
                ),
                handler=b.handler,
                attributes=tuple(b.attributes),
                switch_to=b.switch_to,
                ignore_host=b.ignore_host,
            )
            for b in self.filetypes
        )
        all_ft_names = tuple(f.name for f in fts)
        crs = tuple(
            Crawler(
                name=b.name,
                # empty list -> every filetype (metha.c:1022-1031)
                filetypes=tuple(b.filetypes) or all_ft_names,
                depth_limit=b.depth_limit,
                peek_limit=b.peek_limit,
                external=b.external,
                external_peek=b.peek_limit > 0,
                jail=b.jail,
                robotstxt=b.robotstxt,
                spread_workers=b.spread_workers,
                initial_filetype=b.initial_filetype,
                default_handler=b.default_handler,
                init=b.init,
                dynamic_url=b.dynamic_url or LOOKUP,
                extless_url=b.extless_url or LOOKUP,
                dir_url=b.dir_url or LOOKUP,
                unknown_url=b.unknown_url or LOOKUP,
                ftp_dir_url=b.ftp_dir_url or LOOKUP,
            )
            for b in self.crawlers
        )
        cfg = CrawlConfig(
            filetypes=fts, crawlers=crs, user_agent=user_agent
        )
        cfg.validate()
        return cfg


def load_config(
    path: str,
    conf_dirs: Tuple[str, ...] = (),
    user_agent: str = "Methanol-Spark/0.1",
) -> CrawlConfig:
    """Load a ``.conf`` file (plus its include chain) into a
    CrawlConfig."""
    return ConfLoader(conf_dirs).load_file(path).build(user_agent)
