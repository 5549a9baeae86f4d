"""Transcript normalization + shingling — pure Catalyst expressions.

The reference normalizes with per-row ``Series.apply`` python
(reference preprocessing.py:10-119); here every transform is a built-in
``pyspark.sql.functions`` expression so it stays inside whole-stage
codegen and pushes down to the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lowercase, strip punctuation, collapse whitespace.

    Catalyst analogue of the reference's normalize_company_name
    (preprocessing.py:10-43) re-targeted to transcripts.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text -> array<string>."""
    return F.split(normalize_text(col), " ")


def social_handle(col: Column) -> Column:
    """Lower-cased last URL path segment — the reference's social-profile
    block key (P7/B5, deterministic_feature.py:740-756, blocked at
    :394-404): strip query params, strip trailing slashes, take the last
    '/'-separated part. A path-less URL like ``https://example.com``
    yields the lowercased DOMAIN (the scheme's ``//`` makes the string
    contain '/', so the last segment is the host — matching the
    reference's ``parts[-1]`` behavior); only a string with no '/' at
    all (or NULL) yields ''. Callers blocking on this key must filter
    empty handles, as the reference does (handle != '' at :402).
    Pure Catalyst; NULL input yields ''.
    """
    clean = F.regexp_replace(
        F.split(F.coalesce(col, F.lit("")), r"\?").getItem(0), "/+$", ""
    )
    return F.when(
        clean.contains("/"),
        F.lower(F.element_at(F.split(clean, "/"), -1)),
    ).otherwise(F.lit(""))


def word_shingles(col: Column, k: int) -> Column:
    """Distinct hashed word k-shingles -> array<bigint>.

    Built from higher-order ``transform(sequence(...))`` + ``slice`` +
    ``xxhash64`` — all JVM-side, zero Python. Rows with fewer than k words
    fall back to hashing the whole normalized text (one shingle) so short
    texts still participate.

    Maps the reference's token/trigram blocking inputs
    (deterministic_feature.py:758-850) into set-similarity land.
    """
    toks = tokens(col)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, F.lit(k)))),
    )
    norm = normalize_text(col)
    # empty/null text -> EMPTY set (a shared hash('') sentinel would give
    # unrelated empty-transcript rows Jaccard 1.0 and merge them)
    fallback = F.when(
        F.coalesce(F.length(norm), F.lit(0)) > 0, F.array(F.xxhash64(norm))
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(F.when(n >= k, shingled).otherwise(fallback))


def char_shingles(col: Column, k: int) -> Column:
    """Distinct hashed char k-shingles of normalized text -> array<bigint>."""
    norm = normalize_text(col)
    ln = F.length(norm)
    shingled = F.transform(
        F.sequence(F.lit(1), ln - k + 1),
        lambda i: F.xxhash64(norm.substr(i, F.lit(k))),
    )
    fallback = F.when(
        F.coalesce(ln, F.lit(0)) > 0, F.array(F.xxhash64(norm))
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(F.when(ln >= k, shingled).otherwise(fallback))
