"""FTP LIST output parsing (P4) — the ``ftp`` chain parser.

Re-expresses the behavior the reference gets from its vendored
``ftpparse`` (/root/reference/src/libmetha/ftpparse.c, used by
``lm_parser_ftp`` builtin.c:207-244): per-line tolerant parsing of
FTP LIST output; each entry yields its name as a link candidate, with
a trailing '/' appended when the entry may be a directory
(``flagtrycwd`` — directories and symlinks).

Formats handled (the common subset of ftpparse):
- EPLF (``+i...,m...,/,\\tname``);
- Unix/BSD ls -l (``drwxr-xr-x ... name``, symlink target after
  ``->`` is dropped);
- MSDOS IIS (``MM-DD-YY HH:MMAM <DIR>|size name``).

Unparseable lines are skipped (tolerant, like the reference).
"""

from __future__ import annotations

import re
from typing import List, Tuple

_UNIX_RE = re.compile(
    r"^([-dlbcps])[rwxstT-]{9}\s+\d+\s+\S+\s+\S+\s+\d+\s+"
    r"\w{3}\s+\d{1,2}\s+(?:\d{4}|\d{1,2}:\d{2})\s+(.+)$"
)
_MSDOS_RE = re.compile(
    r"^\d{2}-\d{2}-\d{2,4}\s+\d{2}:\d{2}(?:AM|PM)\s+(<DIR>|\d+)\s+(.+)$"
)


def parse_ftp_listing(text: str) -> List[Tuple[str, bool]]:
    """[(name, is_dir_candidate)] per parseable line, in order."""
    out: List[Tuple[str, bool]] = []
    for line in text.splitlines():
        line = line.rstrip("\r")
        if not line:
            continue
        if line.startswith("+"):  # EPLF
            try:
                facts, name = line[1:].split("\t", 1)
            except ValueError:
                continue
            if not name:
                continue
            is_dir = "/" in facts.split(",")
            out.append((name, is_dir))
            continue
        m = _UNIX_RE.match(line)
        if m:
            kind, name = m.group(1), m.group(2)
            if " -> " in name:  # symlink target dropped
                name = name.split(" -> ", 1)[0]
            if name in (".", ".."):
                continue
            # dirs AND symlinks are cwd candidates (flagtrycwd)
            out.append((name, kind in ("d", "l")))
            continue
        m = _MSDOS_RE.match(line)
        if m:
            size_or_dir, name = m.group(1), m.group(2)
            out.append((name, size_or_dir == "<DIR>"))
    return out


def extract_ftp_links(text: str) -> List[str]:
    """The ``ftp`` extract parser: names as link candidates, dirs
    with a '/' suffix (lm_parser_ftp's flagtrycwd handling,
    builtin.c:223-233)."""
    links = []
    for name, is_dir in parse_ftp_listing(text):
        if len(name) >= 126:
            continue  # reference skips over-long names (builtin.c:219)
        links.append(name + "/" if is_dir else name)
    return links
