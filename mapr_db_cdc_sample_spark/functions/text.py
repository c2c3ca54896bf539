"""Text-analysis expression builders (north-star LLM-pipeline surface).

All pure Column expressions — they compile into whole-stage codegen and
have exact DuckDB twins (md5 is md5 everywhere), which is what makes the
dedup/fingerprint queries hash-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default stopword list for ratio/filter ops (kept tiny and fixed so the
#: oracle SQL can inline it).
STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(F.lower(text), " "), lambda t: F.length(t) > 0)


def normalize(text: Column) -> Column:
    """Dedup normalization: lowercase, trim, collapse internal whitespace."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def h16(token: Column) -> Column:
    """Deterministic 16-bit hash of a token: first 4 hex chars of md5.
    Identical in any engine with md5 (DuckDB: ('0x' || substr(md5(t),1,4))::INT)."""
    return F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("int")


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles: one string per window of k consecutive
    tokens; empty array when the document has fewer than k (slice length
    clamps to 0). Built as arrays_zip of k shifted slices, NOT
    element_at over an index sequence: Spark inlines the `toks`
    expression into every lambda call site, so the indexed form
    re-evaluates the whole tokenizer per window element — O(len^2) per
    document when called as shingles(tokens(text)) (measured 10x on
    q99). The zip form evaluates `toks` k+1 times total, linear.
    coalesce keeps the old contract of [] (not NULL) for NULL token
    input — slice/arrays_zip would otherwise propagate the NULL."""
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = [F.slice(toks, j + 1, n).alias(f"t{j}") for j in range(k)]
    return F.coalesce(
        F.transform(
            F.arrays_zip(*parts),
            lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(k)]),
        ),
        F.array().cast("array<string>"),
    )


#: Fixed 60-bit seeds for the XOR-family MinHash (one md5 per shingle,
#: h_j = h XOR seed_j — 8 independent-enough permutations for the cost of
#: one hash; the classic cheap MinHash family).
MINHASH_SEEDS = (
    0x9E3779B97F4A7C1,
    0xC2B2AE3D27D4EB4,
    0x165667B19E3779F,
    0x27D4EB2F165667C,
    0x5BD1E9955BD1E99,
    0x85EBCA6B27D4EB2,
    0xCC9E2D51CC9E2D5,
    0x1B873593C2B2AE3,
)


def shingle_hash60(shingle: Column) -> Column:
    """60-bit shingle hash: first 15 hex chars of md5, as BIGINT —
    DuckDB twin: ('0x' || SUBSTR(MD5(s), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (robust to word reordering, the classic near-dup
    canonicalization)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))
