"""Deterministic synthetic-web generator.

Produces the BASELINE.json ``input_hint`` table shape:

    docs(doc_id string,                    -- canonical URL
         spans array<struct<kind string, text string,
                            media_ref string, offset int>>,
         content_type string, status int, location string)

Per-host document counts follow a Zipf(s) law (explicit hot-host skew
per the bench protocol in BASELINE.md). Everything is seeded — no
wall-clock, no external data. ``doc_id`` doubles as the document URL;
the crawl "fetch" is a join against this table.

Link conventions (FIXTURES.md §1): text spans embed href/src HTML
fragments (relative + absolute + cross-host), bare http:// URLs for
the text parser, url(...) forms in css docs; media spans carry
media_ref image URLs. robots.txt bodies are served as ordinary docs.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "content_type string, status int, location string"
)

_WORDS = (
    "spark crawl frontier shuffle merge scan batch round robots filter "
    "token bucket bloom anti join window depth host link parse span"
).split()


@dataclass
class SynthDoc:
    doc_id: str
    spans: List[Tuple[str, Optional[str], Optional[str], int]]
    content_type: str
    status: int = 200
    location: Optional[str] = None

    def as_row(self) -> tuple:
        return (
            self.doc_id,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in self.spans
            ],
            self.content_type,
            self.status,
            self.location,
        )


@dataclass
class SynthWeb:
    docs: List[SynthDoc]
    seeds: List[str]

    @property
    def doc_map(self) -> Dict[str, SynthDoc]:
        return {d.doc_id: d for d in self.docs}

    def to_spark(self, spark):
        return spark.createDataFrame(
            [d.as_row() for d in self.docs], schema=SPAN_SCHEMA
        )


def _zipf_counts(n_docs: int, n_hosts: int, s: float, rng: random.Random) -> List[int]:
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(1, int(round(n_docs * w / total))) for w in weights]
    # trim/pad deterministically to hit n_docs
    while sum(counts) > n_docs:
        counts[counts.index(max(counts))] -= 1
    i = 0
    while sum(counts) < n_docs:
        counts[i % n_hosts] += 1
        i += 1
    return counts


def generate_web(
    n_docs: int = 100,
    n_hosts: int = 5,
    seed: int = 42,
    zipf_s: float = 1.1,
    links_per_doc: int = 4,
    cross_host_fraction: float = 0.15,
    media_fraction: float = 0.2,
    css_fraction: float = 0.08,
    txt_fraction: float = 0.1,
    redirect_fraction: float = 0.04,
    robots_hosts_fraction: float = 0.5,
    with_robots: bool = True,
) -> SynthWeb:
    """Build a deterministic synthetic web. Returns docs + seed URLs."""
    rng = random.Random(seed)
    counts = _zipf_counts(n_docs, n_hosts, zipf_s, rng)
    hosts = [f"h{i:04d}.test" for i in range(n_hosts)]

    # lay out per-host page URLs first so links can point anywhere
    pages: Dict[str, List[str]] = {}
    kinds: Dict[str, str] = {}  # url -> html|txt|css|dir|dyn
    for h, cnt in zip(hosts, counts):
        urls = []
        for j in range(cnt):
            r = rng.random()
            if r < css_fraction:
                u, k = f"http://{h}/c/s{j}.css", "css"
            elif r < css_fraction + txt_fraction:
                u, k = f"http://{h}/t/n{j}.txt", "txt"
            else:
                style = rng.random()
                if style < 0.6:
                    u, k = f"http://{h}/p/page{j}.html", "html"
                elif style < 0.75:
                    u, k = f"http://{h}/d/item{j}", "html"  # extless
                elif style < 0.9:
                    u, k = f"http://{h}/s/sub{j}/", "html"  # dir
                else:
                    u, k = f"http://{h}/q/view.php?id={j}", "html"  # dynamic
            urls.append(u)
            kinds[u] = k
        pages[h] = urls

    all_urls = [u for h in hosts for u in pages[h]]
    docs: List[SynthDoc] = []

    def words(n):
        return " ".join(rng.choice(_WORDS) for _ in range(n))

    for h in hosts:
        for u in pages[h]:
            kind = kinds[u]
            if kind == "css":
                n_refs = rng.randint(1, 2)
                body = ""
                for _ in range(n_refs):
                    tgt = rng.choice(pages[h])
                    body += f".x {{ background: url({tgt}); }}\n"
                docs.append(
                    SynthDoc(u, [("text", body, None, 0)], "text/css")
                )
                continue
            if kind == "txt":
                tgt = rng.choice(all_urls)
                body = f"{words(8)} {tgt} {words(4)}"
                docs.append(
                    SynthDoc(u, [("text", body, None, 0)], "text/plain")
                )
                continue
            # html-ish page: interleaved text + media spans
            if rng.random() < redirect_fraction:
                tgt = rng.choice(pages[h])
                docs.append(
                    SynthDoc(u, [], "text/html", status=301, location=tgt)
                )
                continue
            spans: List[Tuple[str, Optional[str], Optional[str], int]] = []
            offset = 0
            n_links = rng.randint(1, links_per_doc)
            for _ in range(n_links):
                if rng.random() < cross_host_fraction and len(hosts) > 1:
                    other = rng.choice([x for x in hosts if x != h])
                    tgt = rng.choice(pages[other])
                else:
                    tgt = rng.choice(pages[h])
                    if rng.random() < 0.5 and tgt.startswith(f"http://{h}"):
                        tgt = tgt[len(f"http://{h}") :]  # relative form
                frag = f"<p>{words(6)}</p><a href=\"{tgt}\">{words(2)}</a>"
                spans.append(("text", frag, None, offset))
                offset += 1
                if rng.random() < media_fraction:
                    media_url = f"http://{h}/img/m{rng.randint(0, 99)}.png"
                    spans.append(("media", None, media_url, offset))
                    offset += 1
            docs.append(SynthDoc(u, spans, "text/html"))

    if with_robots:
        n_rob = max(1, int(n_hosts * robots_hosts_fraction))
        for h in hosts[:n_rob]:
            body = (
                "User-agent: *\n"
                "Disallow: /q/\n"
                f"Allow: /q/view.php?id=0\n"
            )
            docs.append(
                SynthDoc(
                    f"http://{h}/robots.txt",
                    [("text", body, None, 0)],
                    "text/plain",
                )
            )

    seeds = [pages[h][0] for h in hosts[: min(3, n_hosts)]]
    return SynthWeb(docs=docs, seeds=seeds)


def generate_ftp_web() -> SynthWeb:
    """Deterministic FTP mini-tree (S6): every doc is a directory's
    LIST response carried as one ``kind='ftplist'`` span, mixing the
    three formats the ftp parser handles (EPLF, Unix ls, MSDOS IIS)
    plus a symlink (flagtrycwd) and an unparseable line. Shared by the
    conf/ftp.conf end-to-end tests and the crawl_ftp driver query."""

    def listing(url, lines):
        return SynthDoc(
            doc_id=url,
            spans=[("ftplist", "\n".join(lines) + "\n", None, 0)],
            content_type="text/plain",
        )

    docs = [
        listing(
            "ftp://f01.test/",
            [
                "+i8388621.29609,m824255902,/,\tpub",
                "+i8388621.44468,m839956783,r,s10376,\twelcome.msg",
                "drwxr-xr-x   2 root  ftp   4096 Jan 10 2024 src",
                "-rw-r--r--   1 root  ftp   1024 Jan 10 2024 readme.txt",
                "lrwxrwxrwx   1 root  ftp      3 Jan 10 13:30 latest -> src",
            ],
        ),
        listing(
            "ftp://f01.test/pub/",
            [
                "01-10-24  01:30PM       <DIR>          data",
                "01-10-24  01:31PM                10234 notes.txt",
            ],
        ),
        listing(
            "ftp://f01.test/pub/data/",
            ["-rw-r--r--   1 root  ftp  99 Jan 10 2024 blob.bin"],
        ),
        listing(
            "ftp://f01.test/src/",
            ["drwxr-xr-x   2 root ftp 4096 Jan 11 2024 v2"],
        ),
        listing(
            "ftp://f01.test/src/v2/",
            ["-rw-r--r--   1 root ftp 5 Jan 11 2024 tag"],
        ),
        listing(
            "ftp://f01.test/latest/",
            ["-rw-r--r--  1 root ftp 5 Jan 11 2024 head"],
        ),
        listing(
            "ftp://f02.test/",
            ["+i1.2,m3,/,\tmirror",
             "garbage line that parses to nothing"],
        ),
        listing("ftp://f02.test/mirror/", []),
    ]
    return SynthWeb(
        docs=docs, seeds=["ftp://f01.test/", "ftp://f02.test/"]
    )
