"""Batch-HTTP fetch stage (S3's real-deployment seam).

In this sandbox the "fetch" is a join against the synthetic docs
table; on a real crawl the same slot is a ``mapInPandas`` stage that
performs the HTTP GETs — Arrow-batched, one connection-reusing
transport per partition, bounded concurrency inside the worker (the
reference's curl multi loop, io.c:767-816, becomes per-partition
batched I/O; Spark's partitioning replaces its worker threads).

The transport is injectable so unit tests drive the full stage with a
stub (no network leaves the machine in-sandbox); the default transport
uses stdlib urllib only, and is NEVER exercised by tests or benches
here. Responses land in the engine's docs-table shape
(doc_id/spans/content_type/status/location) so everything downstream
(writefile, parsers, redirects, robots) is unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame, types as T

# (status, content_type, location, body) per URL
FetchResult = Tuple[int, Optional[str], Optional[str], Optional[str]]
Transport = Callable[[str, float, int], FetchResult]

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("location", T.StringType()),
    ]
)


def urllib_transport(url: str, timeout: float,
                     max_bytes: int) -> FetchResult:
    """Default stdlib transport (redirects NOT followed — the engine
    owns redirect semantics, worker.c:808/ue_revert). Never exercised
    in-sandbox; unit tests inject a stub instead."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": "methanol-spark/1.0"}
    )

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **kw):  # noqa: D102
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        with opener.open(req, timeout=timeout) as resp:
            body = resp.read(max_bytes)
            ct = resp.headers.get("Content-Type")
            return (
                resp.status,
                ct.split(";")[0].strip() if ct else None,
                None,
                body.decode("utf-8", "replace"),
            )
    except urllib.error.HTTPError as e:
        loc = e.headers.get("Location") if e.headers else None
        return (e.code, None, loc, None)
    except Exception:
        return (0, None, None, None)  # connect error -> status 0


def make_http_fetcher(
    transport: Transport = urllib_transport,
    timeout: float = 30.0,
    max_bytes: int = 1 << 20,
):
    """fetcher(urls_df) -> docs-shaped DataFrame.

    ``urls_df`` must carry a ``url`` column; output joins back on
    ``doc_id == url`` exactly where the synthetic docs join sits in
    the round loop (plans/crawl.py fetch join)."""
    import pandas as pd

    def fetch(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for url in pdf["url"]:
                status, ct, loc, body = transport(
                    url, timeout, max_bytes
                )
                spans = (
                    [
                        {
                            "kind": "text",
                            "text": body,
                            "media_ref": None,
                            "offset": 0,
                        }
                    ]
                    if body is not None
                    else None
                )
                rows.append([url, spans, ct, status, loc])
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "spans", "content_type", "status",
                    "location",
                ],
            )

    def fetcher(urls_df: DataFrame) -> DataFrame:
        return urls_df.select("url").distinct().mapInPandas(
            fetch, DOCS_SCHEMA
        )

    return fetcher
