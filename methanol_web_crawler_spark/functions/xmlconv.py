"""xmlconv — HTML -> well-formed-XML transform parser.

Re-implements the behavior of the reference's ``lm_parser_xmlconv``
(/root/reference/src/libmetha/html.c:401-742), the chained transform
that feeds JS/E4X parsers well-formed XML:

- drop ``<!DOCTYPE ...>``, ``<!-- ... -->`` comments and ``<? ... ?>``
  processing instructions;
- lowercase tag and attribute names;
- replace ``&`` with ``&amp;`` in text content (so HTML-only entities
  survive an XML parser);
- self-close void elements (br hr img link meta base basefont area
  input — html.c:358-362);
- entity-encode the bodies of script/style/textarea (html.c:370-374);
- auto-close misnested tags via an element stack;
- wrap everything in ``<html>`` when the root tag is missing.

This is a *transform* parser: it rewrites the buffer for the next
parser in the chain (parser chaining, metha.c:1219-1235 /
worker.c:836-911); it extracts no URLs itself.
"""

from __future__ import annotations

import re
from typing import List

VOID_ELEMENTS = frozenset(
    ("br", "hr", "img", "link", "meta", "base", "basefont", "area",
     "input")
)
ENC_CONTENT = frozenset(("script", "style", "textarea"))

_DOCTYPE_RE = re.compile(r"<!DOCTYPE[^>]*>", re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_PI_RE = re.compile(r"<\?.*?\?>", re.DOTALL)
_TAG_RE = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>", re.DOTALL)
_ATTR_RE = re.compile(
    r"([A-Za-z_:][-A-Za-z0-9_:.]*)\s*(=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)


def _encode_text(s: str) -> str:
    return s.replace("&", "&amp;")


def _encode_all(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _rewrite_attrs(raw: str) -> str:
    out = []
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        if m.group(2):
            val = m.group(3)
            if not (val.startswith('"') or val.startswith("'")):
                val = '"' + val + '"'
            out.append(f"{name}={val}")
        else:
            # bare attribute -> XML requires a value
            out.append(f'{name}="{name}"')
    return (" " + " ".join(out)) if out else ""


def html_to_xml(body: str) -> str:
    """Transform an HTML document into well-formed XML."""
    body = _DOCTYPE_RE.sub("", body)
    body = _COMMENT_RE.sub("", body)
    body = _PI_RE.sub("", body)

    out: List[str] = []
    stack: List[str] = []
    pos = 0
    enc_until_close: str = ""

    for m in _TAG_RE.finditer(body):
        text = body[pos : m.start()]
        closing, name, attrs, selfclose = (
            m.group(1), m.group(2).lower(), m.group(3), m.group(4)
        )

        if enc_until_close:
            if closing and name == enc_until_close:
                out.append(_encode_all(text))
                out.append(f"</{name}>")
                if stack and stack[-1] == name:
                    stack.pop()
                enc_until_close = ""
                pos = m.end()
            # anything else inside an enc-content element is body text
            continue

        out.append(_encode_text(text))
        pos = m.end()

        if closing:
            if name in stack:
                # auto-close misnested tags down to the match
                while stack and stack[-1] != name:
                    out.append(f"</{stack.pop()}>")
                out.append(f"</{stack.pop()}>")
            # stray closer: dropped
            continue

        attr_str = _rewrite_attrs(attrs)
        if name in VOID_ELEMENTS or selfclose:
            out.append(f"<{name}{attr_str} />")
            continue
        out.append(f"<{name}{attr_str}>")
        if name in ENC_CONTENT:
            enc_until_close = name
            stack.append(name)
        else:
            stack.append(name)

    out.append(_encode_text(body[pos:]))
    while stack:
        out.append(f"</{stack.pop()}>")

    doc = "".join(out)
    if "<html" not in doc[:200].lower():
        doc = "<html>" + doc + "</html>"
    return doc
