"""robots.txt parsing and gating with exact reference semantics.

Re-implements /root/reference/src/libmetha/worker.c:985-1071
(``lm_worker_get_robotstxt``) and filter.c:34-107 (rule list + eval):

- rules are PATH-prefix matches (umex_explicit_strstart);
- ``User-agent:`` gates following rules; ``*`` enables; otherwise the
  rule block is enabled iff the configured user-agent *contains* the
  value as a substring (worker.c:1036-1041); rules seen *before* any
  User-agent line are enabled (``enable`` starts at 1, QUIRK);
- lines without a ':' stop parsing entirely (worker.c:1019-1021 QUIRK);
- '#' comment lines skipped;
- rule-list ordering QUIRK (filter.c:75-107): a new Allow rule is
  swapped with the *first* Deny rule (the Deny moves to the end), a
  Deny rule appends — yielding Allow-before-first-Deny order, not a
  full sort;
- evaluation: first matching rule wins; Allow -> allow, Deny -> deny;
  no match -> allow (filter.c:34-54);
- empty Disallow value => empty prefix matches everything => denies
  all (the reference has no special case for it).

The robots body is fetched like any document (http://host/robots.txt)
— and it is fetched even when the active crawler does not use robots
rules (worker.c:269-283 QUIRK), which matters for fetch metrics.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

# a rule is (allow: bool, path_prefix: str)
Rule = Tuple[bool, str]


def add_rule(rules: List[Rule], allow: bool, prefix: str) -> None:
    """Insert preserving the reference's Allow-swap order."""
    if allow:
        for x, (a, _) in enumerate(rules):
            if not a:
                rules.append(rules[x])
                rules[x] = (True, prefix)
                return
        rules.append((True, prefix))
    else:
        rules.append((False, prefix))


def parse_robots(body: Optional[str], user_agent: str) -> List[Rule]:
    """Parse a robots.txt body into the ordered rule list."""
    rules: List[Rule] = []
    if not body:
        return rules
    enable = True
    s = 0
    n = len(body)
    while s < n:
        while s < n and body[s].isspace():
            s += 1
        if s >= n:
            break
        if body[s] == "#":
            while s < n and body[s] != "\n":
                s += 1
            continue
        colon = body.find(":", s)
        if colon < 0:
            break  # QUIRK: a colonless line aborts parsing
        opt = body[s:colon]
        s = colon + 1
        # QUIRK: the reference skips ALL whitespace after ':' including
        # newlines (worker.c:1023-1025) — an empty "Disallow:" line
        # consumes the NEXT line as its value.
        while s < n and body[s].isspace():
            s += 1
        nl = body.find("\n", s)
        if nl < 0:
            nl = n
        val = body[s:nl]
        if opt == "User-agent":
            enable = val == "*" or (val != "" and val in user_agent)
        elif enable:
            if opt == "Disallow":
                add_rule(rules, False, val)
            elif opt == "Allow":
                add_rule(rules, True, val)
        s = nl
    return rules


def robots_allows(rules: List[Rule], path: str) -> bool:
    """First path-prefix match wins; default allow (filter.c:34-54)."""
    for allow, prefix in rules:
        if path.startswith(prefix):
            return allow
    return True
