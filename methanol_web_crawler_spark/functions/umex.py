"""UMEX — URL Matching EXpressions, compiled to Python regexes.

The reference compiles UMEX patterns to a small bytecode VM
(/root/reference/src/libmetha/umex.c:285-546 compiler, umex.c:93-224
match VM). We port the *semantics*, not the bytecode: each pattern
compiles once (at driver) to an anchored regex over one URL part.

Pattern grammar (doc/methanol.texinfo):

    [PART<pattern>]...   PART in {FULL, HOST, PATH, FILE}
    '*'  any run of characters       (STRBEGIN/STRFIND/STREND ops)
    '?'  any single character        (ANYCHAR)
    '!'  prefix negation             (QUIRK: compiled but *ignored* by
                                      the reference VM — umex.c:139-141
                                      sets `not` and never reads it; we
                                      preserve the no-op)

URL parts (umex.c:104-126):
    HOST  url[host_o : host_o+host_l]
    PATH  url[host_o+host_l :]        (root slash + query included)
    FILE  url[file_o+1 :]             (after the last '/')
    FULL  the whole canonical URL

A pattern with no '*' must match the part exactly (STRMATCH requires
str+len == str_end); 'a*' anchors only at start; '*a' only at end;
all segments are matched in order.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

from .canonicalize import ParsedUrl

_PARTS = ("PATH", "HOST", "FILE", "FULL")

_SECTION_RE = re.compile(r"(PATH|HOST|FILE|FULL)<([^>]*)>")


def _segment_regex(pattern: str) -> str:
    """Translate one '<...>' body: '*' -> '.*', '?' -> '.', else literal."""
    out: List[str] = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


class Umex:
    """One compiled UMEX: a list of (part, regex) sections, all of
    which must match (the VM runs sections sequentially and returns 0
    on the first mismatch)."""

    __slots__ = ("source", "sections")

    def __init__(self, source: str):
        self.source = source
        body = source.strip()
        # QUIRK: '!' negation is parsed but has no effect in the
        # reference VM; strip and ignore.
        if body.startswith("!"):
            body = body[1:]
        sections: List[Tuple[str, re.Pattern]] = []
        pos = 0
        for m in _SECTION_RE.finditer(body):
            sections.append(
                (m.group(1), re.compile(_segment_regex(m.group(2)), re.DOTALL))
            )
            pos = m.end()
        if not sections:
            # a bare pattern with no part selector matches FULL
            sections.append(
                ("FULL", re.compile(_segment_regex(body), re.DOTALL))
            )
        self.sections = sections

    def part_of(self, p: ParsedUrl, part: str) -> str:
        if part == "HOST":
            return p.host
        if part == "PATH":
            return p.path
        if part == "FILE":
            return p.filename
        return p.url

    def match(self, p: ParsedUrl) -> bool:
        for part, rx in self.sections:
            if not rx.fullmatch(self.part_of(p, part)):
                return False
        return True


def compile_umex(source: Optional[str]) -> Optional[Umex]:
    return Umex(source) if source else None


def path_prefix_umex(prefix: str) -> Umex:
    """``umex_explicit_strstart`` (umex.c:226-258): PATH<prefix*>,
    used by the robots.txt rule builder. The prefix itself is literal
    (no wildcard interpretation)."""
    u = Umex.__new__(Umex)
    u.source = f"PATH<{prefix}*>"
    u.sections = [("PATH", re.compile(re.escape(prefix) + ".*", re.DOTALL))]
    return u
