"""Driver-contract queries + DuckDB oracles (see __spark_entry__.py).

One entry per implemented operator family from SURVEY.md §2, expressed
over the driver's testdata tables, each with an exact ANSI-SQL oracle.
Integer determinism (md5-derived hashes, rounded doubles) makes even
MinHash/SimHash signatures hash-comparable across engines.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F, types as T

from .config import default_config, media_config
from .functions import textstats
from .functions.canonicalize import parse_url
from .functions.classify import FtIndex
from .functions.robots import robots_allows
from .operators import dedup as dd
from .operators import similarity as sim
from .sources.synthweb import generate_web

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def _register(name: str, sql: str = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# URL corpus synthesized deterministically from the part table --------------

_URL_CASES_SQL = """
    'http://h' || CAST(p_partkey % 40 AS VARCHAR) || '.test' ||
    CASE CAST(p_partkey % 6 AS INTEGER)
      WHEN 0 THEN '/p/doc' || CAST(p_partkey AS VARCHAR) || '.html'
      WHEN 1 THEN '/img/pic' || CAST(p_partkey AS VARCHAR) || '.png'
      WHEN 2 THEN '/a/track' || CAST(p_partkey AS VARCHAR) || '.mp3'
      WHEN 3 THEN '/d/item' || CAST(p_partkey AS VARCHAR)
      WHEN 4 THEN '/s/sub' || CAST(p_partkey AS VARCHAR) || '/'
      ELSE '/q/view.php?id=' || CAST(p_partkey AS VARCHAR)
    END
"""


# ---------------------------------------------------------------------------
# Crawl-relational operators (SURVEY.md §2.2/§2.4/§2.5) over TPC-H-ish tables
# ---------------------------------------------------------------------------


@_register(
    "f8_seen_antijoin",
    f"""
    WITH corpus AS (SELECT p_partkey, {_URL_CASES_SQL} AS url FROM part)
    SELECT p_partkey, url FROM corpus WHERE p_partkey % 3 <> 0
    """,
)
def f8_seen_antijoin(spark, sf_dir):
    """F8 seen-dedup through the REAL engine path: BloomSeenFilter
    update + split (operators/seen.py) then the exact anti-join, the
    same prefilter+join the crawl round runs (plans/crawl.py). URLs
    with p_partkey % 3 == 0 are 'seen'; the other two thirds must
    come out the other side — a bloom false-negative or a broken
    probe changes the row set."""
    from .operators.seen import BloomSeenFilter

    corpus = _url_corpus(spark, sf_dir).withColumn(
        "key_hash", F.xxhash64("url")
    )
    seen = corpus.filter(F.col("p_partkey") % 3 == 0).select(
        "url", "key_hash"
    )
    bloom = BloomSeenFilter(spark, n_buckets=8, m_bits=1 << 16, k=4)
    bloom.update(seen)
    definitely_new, maybe = bloom.split(corpus)
    checked = maybe.join(seen.select("url"), "url", "left_anti")
    return definitely_new.unionByName(checked).select("p_partkey", "url")


@_register(
    "q6_pending_semijoin",
    """
    SELECT o_orderkey,
           CAST(o_orderkey % 4 AS INTEGER) AS depth,
           'h' || CAST(o_custkey AS VARCHAR) AS host
    FROM orders
    WHERE o_orderkey % 4 = (SELECT min(o_orderkey % 4) FROM orders)
    """,
)
def q6_pending_semijoin(spark, sf_dir):
    """Q1/Q6 round selection through the REAL engine function
    (plans/crawl.py split_wave): the BSP wave is the min-depth slice
    of the frontier — ue.c's depth-ordered ue_next analog. The
    frontier is synthesized from orders (depth = o_orderkey % 4)."""
    from .plans.crawl import split_wave

    o = _t(spark, sf_dir, "orders")
    frontier = o.select(
        F.col("o_orderkey"),
        (F.col("o_orderkey") % 4).cast("int").alias("depth"),
        F.concat(F.lit("h"), F.col("o_custkey").cast("string")).alias(
            "host"
        ),
    )
    n, d, elig, rest = split_wave(frontier)
    return elig.select("o_orderkey", "depth", "host")


@_register(
    "q10_politeness_window",
    """
    SELECT host, seen_key FROM (
      SELECT 'h' || CAST(user_id AS VARCHAR) AS host,
             'e' || CAST(event_id AS VARCHAR) AS seen_key,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY event_id % 3, event_id % 7, event_id) AS rn
      FROM events) WHERE rn <= 5
    """,
)
def q10_politeness_window(spark, sf_dir):
    """Q10 per-host politeness budget through the REAL engine
    function (plans/crawl.py politeness_split) on its salted two-phase
    skew path (salt_k=4): the B smallest rows by the crawl sort key
    (ft_rank, parent_round, parent_ord, sibling_ix) fetch; the result
    must equal the exact unsalted per-host window."""
    from .plans.crawl import politeness_split

    e = _t(spark, sf_dir, "events")
    frontier = e.select(
        F.concat(F.lit("h"), F.col("user_id").cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias(
            "seen_key"
        ),
        (F.col("event_id") % 3).cast("int").alias("ft_rank"),
        (F.col("event_id") % 7).cast("int").alias("parent_round"),
        F.col("event_id").cast("long").alias("parent_ord"),
        F.lit(0).alias("sibling_ix"),
    )
    selected, deferred = politeness_split(frontier, budget=5, salt_k=4)
    return selected.select("host", "seen_key")


@_register(
    "q8_priority_topk",
    """
    SELECT o_custkey, o_orderkey, rank FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rank
      FROM orders) WHERE rank <= 3
    """,
)
def q8_priority_topk(spark, sf_dir):
    """Q8 filetype-chain priority: ordered top-k per partition key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


@_register(
    "q12_metrics_agg",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events GROUP BY event_type
    """,
)
def q12_metrics_agg(spark, sf_dir):
    """Q12 session metrics through the REAL snapshot store
    (sources/tables.py): per-round metric deltas are appended to a
    SnapshotTable (atomic manifest commits + lineage) and the final
    counters aggregate over read_until — the same write/read path the
    crawl's metrics/seen/frontier tables use. A broken append,
    manifest, or time-travel read changes the totals."""
    import tempfile

    from .sources.tables import SnapshotStore

    e = _t(spark, sf_dir, "events")
    store = SnapshotStore(tempfile.mkdtemp(prefix="q12_store_"))
    for r in range(4):
        delta = (
            e.filter(F.col("event_id") % 4 == r)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("event_id").alias("sum_event_id"),
            )
        )
        store.table("metrics").append(delta, r, collect_lineage=True)
    merged = store.table("metrics").read_until(spark)
    return merged.groupBy("event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_event_id").alias("sum_event_id"),
    )


def _url_corpus(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    url = F.concat(
        F.lit("http://h"), (pk % 40).cast("string"), F.lit(".test"),
        F.when(pk % 6 == 0,
               F.concat(F.lit("/p/doc"), pk.cast("string"), F.lit(".html")))
        .when(pk % 6 == 1,
              F.concat(F.lit("/img/pic"), pk.cast("string"), F.lit(".png")))
        .when(pk % 6 == 2,
              F.concat(F.lit("/a/track"), pk.cast("string"), F.lit(".mp3")))
        .when(pk % 6 == 3,
              F.concat(F.lit("/d/item"), pk.cast("string")))
        .when(pk % 6 == 4,
              F.concat(F.lit("/s/sub"), pk.cast("string"), F.lit("/")))
        .otherwise(
            F.concat(F.lit("/q/view.php?id="), pk.cast("string"))),
    )
    return p.select(pk.alias("p_partkey"), url.alias("url"))


_URL_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("is_dynamic", T.BooleanType()),
        T.StructField("is_dir", T.BooleanType()),
    ]
)


@_register(
    "s1_url_projection",
    f"""
    SELECT p_partkey, url,
           'h' || CAST(p_partkey % 40 AS VARCHAR) || '.test' AS host,
           CASE CAST(p_partkey % 6 AS INTEGER)
             WHEN 0 THEN 'html' WHEN 1 THEN 'png' WHEN 2 THEN 'mp3'
             WHEN 5 THEN 'php' ELSE '' END AS ext,
           CAST(p_partkey % 6 AS INTEGER) = 5 AS is_dynamic,
           CAST(p_partkey % 6 AS INTEGER) = 4 AS is_dir
    FROM (SELECT p_partkey, {_URL_CASES_SQL} AS url FROM part)
    """,
)
def s1_url_projection(spark, sf_dir):
    """S1/projection: the canonicalize UDF's offset projection checked
    against an independent SQL derivation on well-formed URLs."""
    corpus = _url_corpus(spark, sf_dir)

    @F.pandas_udf(_URL_PARSE_SCHEMA)
    def parse(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            p = parse_url(u)
            rows.append(
                (p.host, p.path, p.ext, p.is_dynamic, p.is_dir)
                if p
                else (None, None, None, None, None)
            )
        return pd.DataFrame(
            rows, columns=["host", "path", "ext", "is_dynamic", "is_dir"]
        )

    parsed = corpus.withColumn("p", parse("url"))
    return parsed.select(
        "p_partkey", "url", "p.host", "p.ext", "p.is_dynamic", "p.is_dir"
    )


@_register(
    "f1_classify_filetype",
    f"""
    SELECT p_partkey, url,
           CASE CAST(p_partkey % 6 AS INTEGER)
             WHEN 0 THEN 'html' WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
             WHEN 3 THEN 'html' WHEN 4 THEN 'html' WHEN 5 THEN 'html'
           END AS filetype
    FROM (SELECT p_partkey, {_URL_CASES_SQL} AS url FROM part)
    """,
)
def f1_classify_filetype(spark, sf_dir):
    """F1/F2 ftindex decision tree vs an independent SQL CASE."""
    cfg = media_config()
    corpus = _url_corpus(spark, sf_dir)

    @F.pandas_udf(T.StringType())
    def classify(urls: pd.Series) -> pd.Series:
        idx = FtIndex(cfg, cfg.crawler("media"))
        out = []
        for u in urls:
            p = parse_url(u)
            if p is None:
                out.append(None)
                continue
            kind, name = idx.match_by_url(p)
            out.append(name if kind == "ft" else None)
        return pd.Series(out)

    return corpus.select(
        "p_partkey", "url", classify("url").alias("filetype")
    )


@_register(
    "f5_robots_gate",
    f"""
    SELECT p_partkey, path,
           CASE WHEN path LIKE '/q/view.php?id=1%' THEN TRUE
                WHEN path LIKE '/q/%' THEN FALSE
                ELSE TRUE END AS allowed
    FROM (SELECT p_partkey,
                 substr(url, length('http://h' ||
                        CAST(p_partkey % 40 AS VARCHAR) || '.test') + 1)
                   AS path
          FROM (SELECT p_partkey, {_URL_CASES_SQL} AS url FROM part))
    """,
)
def f5_robots_gate(spark, sf_dir):
    """F5 robots filter: Allow-before-Deny first-match gating."""
    rules = [(True, "/q/view.php?id=1"), (False, "/q/")]
    corpus = _url_corpus(spark, sf_dir)

    @F.pandas_udf(T.BooleanType())
    def gate(paths: pd.Series) -> pd.Series:
        return pd.Series([robots_allows(rules, p) for p in paths])

    host_len = (
        F.length(
            F.concat(
                F.lit("http://h"),
                (F.col("p_partkey") % 40).cast("string"),
                F.lit(".test"),
            )
        )
        + 1
    )
    with_path = corpus.select(
        "p_partkey",
        F.col("url").substr(host_len, F.length("url")).alias("path"),
    )
    return with_path.select(
        "p_partkey", "path", gate("path").alias("allowed")
    )


@_register(
    "url_canonicalize_edges",
    """
    SELECT p_partkey,
           CASE CAST(p_partkey % 3 AS INTEGER)
             WHEN 0 THEN 'http://e' || CAST(p_partkey AS VARCHAR)
                         || '.test/a/x.html'
             WHEN 1 THEN 'http://e' || CAST(p_partkey AS VARCHAR)
                         || '.test/a/b/x.html'
             ELSE 'http://e' || CAST(p_partkey AS VARCHAR)
                  || '.test/p/x.html?q=a+b&r=1'
           END AS canonical
    FROM part
    """,
)
def url_canonicalize_edges(spark, sf_dir):
    """§1.3 canonicalization rules (// collapse, /./ drop, /../ pop,
    # cut, &amp; decode, space->+) vs literally-precomputed SQL."""
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    raw = (
        F.when(pk % 3 == 0,
               F.concat(F.lit("http://e"), pk.cast("string"),
                        F.lit(".test/a//./x.html#frag")))
        .when(pk % 3 == 1,
              F.concat(F.lit("http://e"), pk.cast("string"),
                       F.lit(".test/a/b/c/../x.html")))
        .otherwise(
            F.concat(F.lit("http://e"), pk.cast("string"),
                     F.lit(".test/p/x.html?q=a b&amp;r=1#x")))
    )

    @F.pandas_udf(T.StringType())
    def canon(urls: pd.Series) -> pd.Series:
        return pd.Series(
            [(parse_url(u).url if parse_url(u) else None) for u in urls]
        )

    return p.select(
        pk.alias("p_partkey"), canon(raw).alias("canonical")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators over documents/embeddings
# ---------------------------------------------------------------------------

_DUPED_DOCS_SQL = """
    (SELECT doc_id, text FROM documents
     UNION ALL
     SELECT doc_id + 1000000 AS doc_id, text FROM documents
     WHERE doc_id % 10 = 0)
"""


def _duped_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionByName(dups)


@_register(
    "dedup_exact",
    f"""
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM {_DUPED_DOCS_SQL} GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    return dd.exact_dedup(_duped_docs(spark, sf_dir), "doc_id", "text")


def _minhash_sql(k: int = 16, m: int = dd.MINHASH_M) -> str:
    sig_cols = ",\n           ".join(
        f"min(({2 * i + 3} * h + {104729 * i + 12345}) % {m}) AS sig{i}"
        for i in range(k)
    )
    return f"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS doc, t.token
      FROM {_DUPED_DOCS_SQL} d,
           unnest(string_split(d.text, ' ')) AS t(token)
      WHERE t.token <> ''
    ), hashed AS (
      SELECT doc,
             ('0x' || substr(md5(token), 1, 15))::BIGINT % {m} AS h
      FROM tok
    )
    SELECT doc, {sig_cols} FROM hashed GROUP BY doc
    """


@_register("dedup_minhash_signatures", _minhash_sql())
def dedup_minhash_signatures(spark, sf_dir):
    """MinHash signatures — integer-exact across engines."""
    return dd.minhash_signatures(_duped_docs(spark, sf_dir), "doc_id",
                                 "text")


def _lsh_pairs_sql(k: int = 16, bands: int = 4,
                   m: int = dd.MINHASH_M) -> str:
    rows = k // bands
    band_selects = []
    for b in range(bands):
        cols = " || '_' || ".join(
            f"CAST(sig{b * rows + j} AS VARCHAR)" for j in range(rows)
        )
        band_selects.append(
            f"SELECT doc, {b} AS band, {cols} AS bucket FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""
    WITH sig AS ({_minhash_sql(k, m)}),
    banded AS ({banded})
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    """


@_register("dedup_minhash_lsh_pairs", _lsh_pairs_sql())
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH candidate pairs (band-bucket self-join)."""
    return dd.minhash_lsh_pairs(_duped_docs(spark, sf_dir), "doc_id",
                                "text")


def _simhash_sql(bits: int = 16, m: int = dd.MINHASH_M) -> str:
    w_cols = ",\n           ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS w{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN w{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS doc, t.token
      FROM {_DUPED_DOCS_SQL} d,
           unnest(string_split(d.text, ' ')) AS t(token)
      WHERE t.token <> ''
    ), hashed AS (
      SELECT doc,
             (('0x' || substr(md5(token), 1, 15))::BIGINT % {m})
               % {1 << bits} AS h
      FROM tok
    ), weights AS (
      SELECT doc, {w_cols} FROM hashed GROUP BY doc
    )
    SELECT doc, CAST({fp} AS BIGINT) AS simhash FROM weights
    """


@_register("dedup_simhash", _simhash_sql())
def dedup_simhash(spark, sf_dir):
    return dd.simhash(_duped_docs(spark, sf_dir), "doc_id", "text")


@_register(
    "dedup_ngram_jaccard",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id AS doc, t.token
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      WHERE t.token <> ''
    ), sizes AS (
      SELECT doc, count(*) AS n FROM tok GROUP BY doc
    ), inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             sa.n AS n_a, sb.n AS n_b, count(*) AS n_inter
      FROM tok a
      JOIN tok b ON a.token = b.token AND a.doc < b.doc
      JOIN sizes sa ON sa.doc = a.doc
      JOIN sizes sb ON sb.doc = b.doc
      WHERE a.doc % 7 = 0 AND b.doc % 5 = 0
      GROUP BY a.doc, b.doc, sa.n, sb.n
    )
    SELECT doc_a, doc_b,
           round(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
    FROM inter
    WHERE round(n_inter / (n_a + n_b - n_inter), 6) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.ngram_jaccard_pairs(d, "doc_id", "text")


@_register(
    "dedup_embedding_cosine",
    """
    WITH base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS norm
      FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 4)
             AS cosine
    FROM base a JOIN base b ON a.id < b.id
    WHERE a.id % 10 = 0
    ORDER BY cosine DESC, id_a, id_b LIMIT 20
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return dd.embedding_cosine_pairs(e, "vec_id", "embedding")


@_register(
    "ann_brute_topk",
    """
    WITH base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS norm
      FROM embeddings
    ), scored AS (
      SELECT q.id AS query_id, b.id AS neighbor_id,
             round(list_dot_product(b.vec, q.vec) / (b.norm * q.norm), 4)
               AS cosine
      FROM base b JOIN base q ON b.id <> q.id
      WHERE q.id < 5
    )
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
               AS rank
      FROM scored) WHERE rank <= 10
    """,
)
def ann_brute_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(e, "vec_id", "embedding")


def _ann_lsh_sql(n_queries: int = 5, k: int = 10,
                 n_planes: int = 6, dim: int = 64) -> str:
    """Exact DuckDB oracle for lsh_topk: the sin(i*997+j) hyperplanes
    are embedded as full-precision double literals generated by the
    SAME Python hyperplanes() the engine lowers into F.lit columns, so
    both engines bucket against bit-identical planes (no libm-sin
    parity risk). Dot-product + round(,4) parity across engines is
    already proven by ann_brute_topk."""
    planes = sim.hyperplanes(dim, n_planes)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec, "
        f"[{', '.join(repr(x) for x in plane)}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS norm
      FROM embeddings
    ), bucketed AS (
      SELECT id, vec, norm,
             CAST({bucket_terms} AS INTEGER) AS bucket
      FROM base
    ), scored AS (
      SELECT q.id AS query_id, b.id AS neighbor_id,
             round(list_dot_product(b.vec, q.vec) / (b.norm * q.norm), 4)
               AS cosine
      FROM bucketed b JOIN bucketed q
        ON b.bucket = q.bucket AND b.id <> q.id
      WHERE q.id < {n_queries}
    )
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
               AS rank
      FROM scored) WHERE rank <= {k}
    """


@_register("ann_lsh_topk", _ann_lsh_sql())
def ann_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return sim.lsh_topk(e, "vec_id", "embedding")


# -- text analysis ----------------------------------------------------------


def _lang_sql() -> str:
    score = {
        lang: " + ".join(
            "CAST((length(' '||text||' ') - length(replace(' '||text||' ',"
            f"' {w} ', ''))) / {len(w) + 2} AS INTEGER)"
            for w in textstats.LANG_MARKERS[lang]
        )
        for lang in textstats.LANG_ORDER
    }
    cases = []
    for lang in textstats.LANG_ORDER:
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{other}"
            for other in textstats.LANG_ORDER
            if other != lang
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    scores_sql = ", ".join(
        f"{expr} AS s_{lang}" for lang, expr in score.items()
    )
    return f"""
    SELECT doc_id, {case_sql} AS lang_pred
    FROM (SELECT doc_id, {scores_sql} FROM documents)
    """


@_register("text_lang_id", _lang_sql())
def text_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang_pred")
    )


@_register(
    "text_quality",
    """
    SELECT doc_id AS doc,
           length(text) AS n_chars,
           len(list_filter(string_split(text, ' '), t -> t <> ''))
             AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             AS n_punct,
           CAST((length(' '||text||' ') -
                 length(replace(' '||text||' ', ' the ', ''))) / 5
                AS INTEGER)
           + CAST((length(' '||text||' ') -
                   length(replace(' '||text||' ', ' a ', ''))) / 3
                  AS INTEGER)
           + CAST((length(' '||text||' ') -
                   length(replace(' '||text||' ', ' and ', ''))) / 5
                  AS INTEGER)
           + CAST((length(' '||text||' ') -
                   length(replace(' '||text||' ', ' of ', ''))) / 4
                  AS INTEGER) AS n_stopwords,
           len(list_distinct(list_filter(string_split(text, ' '),
                                         t -> t <> '')))
             AS n_unique_tokens,
           round((len(list_distinct(list_filter(string_split(text, ' '),
                                                t -> t <> '')))
                  / greatest(len(list_filter(string_split(text, ' '),
                                             t -> t <> '')), 1))
                 * (1 - length(regexp_replace(text, '[A-Za-z0-9 ]', '',
                                              'g'))
                        / greatest(length(text), 1)), 6) AS quality
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return textstats.quality_features(d, "doc_id", "text")


@_register(
    "text_token_counts",
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> ''))
             AS n_ws_tokens,
           len(list_filter(string_split(
                 regexp_replace(text, '([^A-Za-z0-9 ])', ' \\1 ', 'g'),
                 ' '), t -> t <> '')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_ws_tokens"),
        textstats.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@_register(
    "text_fingerprint",
    f"""
    SELECT doc_id AS doc,
           CAST(sum((pos * h) % {1073741789}) % {1073741789} AS BIGINT)
             AS fingerprint
    FROM (
      SELECT doc_id, pos,
             ('0x' || substr(md5(token), 1, 15))::BIGINT
               % {1073741789} AS h
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      ) WHERE token <> ''
    ) GROUP BY doc_id
    """,
)
def text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return textstats.fingerprint(d, "doc_id", "text")


# -- streaming-analog + multimodal ------------------------------------------


@_register(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_ix
      FROM marked
    )
    SELECT user_id, session_ix, count(*) AS n_events,
           min(event_id) AS first_event
    FROM sessioned GROUP BY user_id, session_ix
    """,
)
def events_sessionize(spark, sf_dir):
    """Stateful/streaming analog: gap-based session windows (30 min).
    The live Structured Streaming twin is in streaming/sessions.py."""
    e = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    sessioned = marked.withColumn(
        "session_ix",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sessioned.groupBy("user_id", "session_ix").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


@_register(
    "multimodal_metadata",
    """
    SELECT 'm' || CAST(doc_id AS VARCHAR) ||
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN '.png' WHEN 1 THEN '.mp3' ELSE '.mp4' END
             AS media_ref,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           length(text) AS byte_len,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_metadata(spark, sf_dir):
    """Opaque binary payload + typed metadata columns (media plumbing;
    decode itself is stubbed — operators/media.py)."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ref = F.concat(
        F.lit("m"), did.cast("string"),
        F.when(did % 3 == 0, ".png").when(did % 3 == 1, ".mp3")
        .otherwise(".mp4"),
    )
    mtype = (
        F.when(did % 3 == 0, "image").when(did % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        ref.alias("media_ref"),
        mtype.alias("media_type"),
        F.length("text").alias("byte_len"),
        F.md5("text").alias("content_md5"),
    )


# -- the flagship crawl (rows-only: not SQL-expressible) ---------------------

_SF_SIZES = {
    "sf0.001": (120, 4),
    "sf0.01": (1200, 12),
    "sf0.1": (12000, 40),
}


def _sf_params(sf_dir: str):
    for key, v in _SF_SIZES.items():
        if sf_dir.rstrip("/").endswith(key):
            return v
    return (120, 4)


# Golden per-round metrics for the flagship crawl, generated ONCE from
# the pure-Python oracle (oracle/crawler.py) and cross-checked against
# SparkCrawler at every size (engine == oracle, verified 2026-08-16).
# The crawl reads no parquet -- it runs over generate_web(seed=42) sized
# by _SF_SIZES -- so the result is fully deterministic per scale factor.
# The SQL oracle picks the branch via the orders row count (1500 at
# sf0.001, 15000 at sf0.01, 150000 at sf0.1), letting one static SQL
# string stay valid at every sf the driver or pytest runs.
_FLAGSHIP_GOLDEN_SQL = """
    SELECT round, depth,
           CAST(fetched AS BIGINT) AS fetched,
           CAST(admitted AS BIGINT) AS admitted,
           CAST(targets AS BIGINT) AS targets
    FROM (VALUES
    (1500, 0, 0, 3, 6, 0),
    (1500, 1, 1, 3, 7, 0),
    (1500, 2, 2, 4, 6, 0),
    (1500, 3, 3, 6, 12, 0),
    (1500, 4, 4, 8, 15, 0),
    (1500, 5, 5, 9, 19, 0),
    (1500, 6, 6, 7, 12, 0),
    (1500, 7, 7, 7, 5, 0),
    (1500, 8, 8, 2, 2, 0),
    (1500, 9, 9, 1, 1, 0),
    (15000, 0, 0, 3, 14, 0),
    (15000, 1, 1, 9, 28, 0),
    (15000, 2, 1, 1, 2, 0),
    (15000, 3, 2, 10, 18, 0),
    (15000, 4, 2, 1, 4, 0),
    (15000, 5, 3, 13, 41, 0),
    (15000, 6, 3, 1, 1, 0),
    (15000, 7, 4, 23, 65, 0),
    (15000, 8, 5, 33, 67, 0),
    (15000, 9, 5, 2, 6, 0),
    (15000, 10, 6, 32, 58, 0),
    (15000, 11, 7, 33, 44, 0),
    (15000, 12, 7, 1, 2, 0),
    (15000, 13, 8, 26, 48, 0),
    (15000, 14, 8, 1, 3, 0),
    (15000, 15, 9, 25, 38, 0),
    (15000, 16, 10, 22, 32, 0),
    (15000, 17, 11, 18, 36, 0),
    (15000, 18, 11, 1, 1, 0),
    (15000, 19, 12, 21, 32, 0),
    (15000, 20, 12, 1, 1, 0),
    (15000, 21, 13, 16, 31, 0),
    (15000, 22, 14, 13, 21, 0),
    (15000, 23, 15, 11, 20, 0),
    (15000, 24, 16, 8, 15, 0),
    (15000, 25, 17, 8, 13, 0),
    (15000, 26, 18, 8, 12, 0),
    (15000, 27, 19, 7, 7, 0),
    (15000, 28, 19, 1, 1, 0),
    (15000, 29, 20, 5, 4, 0),
    (15000, 30, 21, 2, 3, 0),
    (15000, 31, 22, 2, 3, 0),
    (15000, 32, 23, 1, 1, 0),
    (15000, 33, 24, 1, 1, 0),
    (15000, 34, 25, 1, 1, 0),
    (150000, 0, 0, 2, 7, 0),
    (150000, 1, 1, 4, 13, 0),
    (150000, 2, 2, 5, 8, 0),
    (150000, 3, 3, 3, 8, 0),
    (150000, 4, 4, 4, 11, 0),
    (150000, 5, 5, 5, 10, 0),
    (150000, 6, 6, 4, 10, 0),
    (150000, 7, 7, 4, 9, 0),
    (150000, 8, 8, 5, 12, 0),
    (150000, 9, 8, 1, 5, 0),
    (150000, 10, 9, 8, 24, 0),
    (150000, 11, 10, 13, 35, 0),
    (150000, 12, 11, 12, 34, 0),
    (150000, 13, 12, 18, 33, 0),
    (150000, 14, 13, 19, 56, 0),
    (150000, 15, 14, 35, 75, 0),
    (150000, 16, 14, 1, 3, 0),
    (150000, 17, 15, 43, 97, 0),
    (150000, 18, 15, 2, 4, 0),
    (150000, 19, 16, 60, 157, 0),
    (150000, 20, 17, 91, 204, 0),
    (150000, 21, 17, 2, 4, 0),
    (150000, 22, 18, 130, 269, 0),
    (150000, 23, 18, 3, 5, 0),
    (150000, 24, 19, 183, 341, 0),
    (150000, 25, 19, 4, 4, 0),
    (150000, 26, 20, 221, 365, 0),
    (150000, 27, 20, 8, 13, 0),
    (150000, 28, 21, 249, 410, 0),
    (150000, 29, 21, 6, 11, 0),
    (150000, 30, 22, 261, 390, 0),
    (150000, 31, 22, 4, 8, 0),
    (150000, 32, 23, 237, 319, 0),
    (150000, 33, 23, 5, 4, 0),
    (150000, 34, 24, 187, 231, 0),
    (150000, 35, 24, 1, 4, 0),
    (150000, 36, 25, 137, 172, 0),
    (150000, 37, 25, 7, 8, 0),
    (150000, 38, 26, 102, 140, 0),
    (150000, 39, 26, 5, 4, 0),
    (150000, 40, 27, 74, 96, 0),
    (150000, 41, 27, 2, 5, 0),
    (150000, 42, 28, 62, 89, 0),
    (150000, 43, 29, 52, 76, 0),
    (150000, 44, 29, 3, 2, 0),
    (150000, 45, 30, 46, 56, 0),
    (150000, 46, 31, 32, 37, 0),
    (150000, 47, 32, 19, 28, 0),
    (150000, 48, 33, 11, 12, 0),
    (150000, 49, 33, 1, 0, 0),
    (150000, 50, 34, 6, 5, 0),
    (150000, 51, 35, 2, 1, 0),
    (150000, 52, 36, 1, 0, 0)
    ) AS t(sf_orders, round, depth, fetched, admitted, targets)
    WHERE sf_orders = (SELECT count(*) FROM orders)
"""


@_register("crawl_flagship", _FLAGSHIP_GOLDEN_SQL)
def crawl_flagship(spark, sf_dir):
    """End-to-end crawl over the deterministic synthetic web, sized by
    scale factor. Returns per-round metrics (round, depth, fetched,
    admitted, targets). Oracle: literal golden VALUES derived from the
    pure-Python BSP crawler (engine parity also enforced by
    tests/test_crawl_golden.py)."""
    from .config import default_config
    from .plans.crawl import SparkCrawler

    n_docs, n_hosts = _sf_params(sf_dir)
    web = generate_web(n_docs=n_docs, n_hosts=n_hosts, seed=42)
    cfg = default_config(robotstxt=True)
    crawler = SparkCrawler(
        spark, web.to_spark(spark), cfg,
        politeness_budget=0, collect_metrics=True,
    )
    stats = crawler.run(web.seeds)
    return spark.createDataFrame(
        [
            (m["round"], m["depth"], m["fetched"], m["admitted"],
             m["targets"])
            for m in stats.per_round
        ],
        "round int, depth int, fetched long, admitted long, targets long",
    )


_JACCARD_EDGES_SQL = """
    WITH tok AS (
      SELECT DISTINCT doc_id AS doc, t.token
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      WHERE t.token <> ''
    ), sizes AS (
      SELECT doc, count(*) AS n FROM tok GROUP BY doc
    ), pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             sa.n AS n_a, sb.n AS n_b, count(*) AS n_inter
      FROM tok a
      JOIN tok b ON a.token = b.token AND a.doc < b.doc
      JOIN sizes sa ON sa.doc = a.doc
      JOIN sizes sb ON sb.doc = b.doc
      WHERE a.doc % 7 = 0 AND b.doc % 5 = 0
      GROUP BY a.doc, b.doc, sa.n, sb.n
    )
    SELECT doc_a, doc_b FROM pairs
    WHERE round(n_inter / (n_a + n_b - n_inter), 6) >= 0.3
"""


@_register(
    "dedup_components",
    f"""
    WITH RECURSIVE e AS ({_JACCARD_EDGES_SQL}),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM e
      UNION SELECT doc_b, doc_a FROM e
    ),
    nodes AS (SELECT DISTINCT a AS node FROM und),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.comp FROM reach r JOIN und u ON u.a = r.node
    )
    SELECT node AS doc, min(comp) AS component
    FROM reach GROUP BY node
    """,
)
def dedup_components(spark, sf_dir):
    """Near-dup clusters: connected components over the Jaccard pair
    graph via iterative min-label propagation — the scalable
    clustering step after LSH candidate generation (oracle: a
    recursive-CTE transitive closure)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    edges = dd.ngram_jaccard_pairs(d, "doc_id", "text")
    return dd.connected_components(edges)


@_register(
    "rel_explode_top_tokens",
    """
    SELECT token, count(*) AS doc_freq FROM (
      SELECT DISTINCT doc_id, t.token
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      WHERE t.token <> ''
    ) GROUP BY token ORDER BY doc_freq DESC, token LIMIT 20
    """,
)
def rel_explode_top_tokens(spark, sf_dir):
    """§2.5 explode/flatMap + hash-agg + sort/limit: top tokens by
    document frequency."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(20)
    )


@_register(
    "rel_union_distinct",
    """
    SELECT DISTINCT n_name FROM (
      SELECT n.n_name FROM customer c JOIN nation n
        ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT n.n_name FROM supplier s JOIN nation n
        ON s.s_nationkey = n.n_nationkey
    )
    """,
)
def rel_union_distinct(spark, sf_dir):
    """§2.5 set ops: union + distinct (frontier ∪ new-links shape)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    a = c.join(n, c.c_nationkey == n.n_nationkey).select("n_name")
    b = s.join(n, s.s_nationkey == n.n_nationkey).select("n_name")
    return a.unionByName(b).distinct()
