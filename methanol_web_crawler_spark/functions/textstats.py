"""Text-analysis functions for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting
and document fingerprinting — all as JVM-side column expressions
(zero Python), each with an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker words per language for the n-gram/stopword heuristic;
# deliberately simple and 1:1 reproducible in SQL
LANG_MARKERS = {
    "en": ("the", "and"),
    "es": ("el", "la"),
    "fr": ("le", "les"),
    "de": ("der", "und"),
    "zh": ("de", "shi"),
}


def token_count(text_col) -> "F.Column":
    """Whitespace token count (empty tokens excluded)."""
    return F.size(F.filter(F.split(text_col, " "), lambda t: t != ""))


def bpe_ish_token_count(text_col) -> "F.Column":
    """A BPE-flavored proxy: alphanumeric runs + standalone
    punctuation marks each count as one token."""
    return F.size(
        F.filter(
            F.split(F.regexp_replace(text_col, "([^A-Za-z0-9 ])", " $1 "),
                    " "),
            lambda t: t != "",
        )
    )


def marker_count(text_col, word: str) -> "F.Column":
    """Occurrences of a marker word with space padding."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    target = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded,
                                                      target, "")))
        / len(target)
    ).cast("int")


LANG_ORDER = ("en", "es", "fr", "de", "zh")


def lang_id(text_col) -> "F.Column":
    """Heuristic language id: the language whose marker words occur
    most often; a fixed CASE cascade (LANG_ORDER) breaks ties —
    first language whose score is maximal and positive wins.
    Deterministic and replicated verbatim in the SQL oracle."""
    scores = {
        lang: sum(
            [marker_count(text_col, w) for w in LANG_MARKERS[lang]],
            F.lit(0),
        )
        for lang in LANG_ORDER
    }
    expr = F.lit("unknown")
    for lang in reversed(LANG_ORDER):
        cond = scores[lang] > 0
        for other in LANG_ORDER:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def word_ngrams(text, n: int):
    """All word n-grams of a text column as ``array<string>`` (space-
    joined), empty for texts with fewer than ``n`` tokens. The
    ``when`` guard matters: ``sequence(1, size-n+1)`` with a stop
    below 1 generates a DESCENDING range, not an empty one. Shared by
    the decontamination operator and the repetition feature."""
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition (the Gopher/MassiveText duplicate-
    n-gram rule): the fraction of a doc's word n-grams that are
    repeats of an earlier gram in the SAME doc — boilerplate and
    degenerate repetition score high and get filtered from the
    training mix. Entirely within-row array expressions (no explode,
    no shuffle): a pure JVM projection at any corpus size.

    Returns ``(doc, n_grams, n_distinct_grams, rep_ratio)`` with
    ``rep_ratio = round(1 - distinct/total, 6)`` (0 for docs too
    short to have grams)."""
    grams = word_ngrams(F.col(text_col), n)
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    return df.select(
        F.col(id_col).alias("doc"),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        # (total - distinct)/total, with the greatest() guard making
        # gram-less docs 0/1 = 0 (NOT the 1 - distinct/total form,
        # whose guard yields a bogus 1.0 for empty docs)
        F.round(
            (n_grams - n_distinct) / F.greatest(n_grams, F.lit(1)), 6
        ).alias("rep_ratio"),
    )


def quality_features(
    df: DataFrame, id_col: str, text_col: str, extra_cols: tuple = ()
) -> DataFrame:
    """Length/punctuation/stopword/uniqueness features + a composite
    quality score (rounded — SQL-exact). ``extra_cols`` pass through
    unchanged so a pipeline can filter on ``quality`` without a
    join-back (operators/curation.py)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    n_stop = sum(
        [marker_count(text, w) for w in ("the", "a", "and", "of")],
        F.lit(0),
    )
    n_uniq = F.size(F.array_distinct(
        F.filter(F.split(text, " "), lambda t: t != "")
    ))
    return df.select(
        F.col(id_col).alias("doc"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        n_uniq.alias("n_unique_tokens"),
        F.round(
            (n_uniq / F.greatest(n_tokens, F.lit(1)))
            * (1 - n_punct / F.greatest(n_chars, F.lit(1))),
            6,
        ).alias("quality"),
        *[F.col(c) for c in extra_cols],
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                mod: int = 1073741789) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted sum of
    md5-derived token hashes mod a prime (a rolling-hash analog that
    is exactly SQL-replicable via unnest WITH ORDINALITY).

    Within-row: positions come from the transform index over the raw
    split array (empty tokens keep their position slot, contributing
    0 — identical to posexplode + filter), the sum is an array
    aggregate — a pure JVM projection, zero shuffles (was two:
    posexplode + groupBy-doc). Each term is < mod ~ 2^30, so the long
    accumulator cannot overflow at any realistic token count."""
    arr = F.split(F.col(text_col), " ")
    terms = F.transform(
        arr,
        lambda t, i: F.when(
            t != "",
            ((i + F.lit(1))
             * (F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                .cast("long") % F.lit(mod))) % F.lit(mod),
        ).otherwise(F.lit(0).cast("long")),
    )
    # cheap emptiness filter before the hash projection (trim != ''
    # iff some token is non-empty; split is on single spaces):
    # row-count consumers never evaluate the md5 terms
    out = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc"), terms.alias("__t")
    )
    return out.select(
        "doc",
        (F.aggregate(
            F.col("__t"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ) % F.lit(mod)).alias("fingerprint"),
    )
