"""Text-analysis column expressions (EXT: LLM-pipeline text ops).

All UDF-free: tokenization, n-grams, language-ID scoring, quality
metrics, token counting and fingerprinting are Column expressions that
stay inside whole-stage codegen. Ratios are int/int double divisions and
md5 digests — bit-exact vs the DuckDB oracle by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pseudo-language marker sets over the corpus vocabulary (documents.text
# has a closed ~31-word vocab; see FIXTURES.md). The same constants are
# inlined into the oracle SQL — keep in sync via the helpers below.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "sqlish": ("join", "filter", "scan", "sort", "merge", "hash", "group", "agg"),
    "streamish": ("stream", "window", "batch", "row", "vector"),
    "bizish": ("customer", "order", "part", "query", "table"),
}
STOPWORDS: tuple[str, ...] = ("a", "the")


def bag_tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """Order-preserving, duplicate-keeping tokens (for counting/n-grams)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(col), pattern), lambda t: t != F.lit(""))


def set_tokens(col: Column | str) -> Column:
    return F.array_distinct(bag_tokens(col))


def marker_score(tokens_set: Column, markers: tuple[str, ...]) -> Column:
    """|distinct tokens ∩ marker set| as double."""
    lit_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(tokens_set, lit_arr)).cast("double")


def lang_id(tokens_set: Column) -> Column:
    """Argmax of marker-set hits with deterministic tie-break (dict order)."""
    scores = {k: marker_score(tokens_set, v) for k, v in LANG_MARKERS.items()}
    ks = list(LANG_MARKERS)
    expr = F.when(
        (scores[ks[0]] >= scores[ks[1]]) & (scores[ks[0]] >= scores[ks[2]]), ks[0]
    ).when(scores[ks[1]] >= scores[ks[2]], ks[1]).otherwise(ks[2])
    return expr


def stopword_ratio(tokens_bag: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tokens_bag, lambda t: F.array_contains(stops, t)))
    return n_stop.cast("double") / F.size(tokens_bag).cast("double")


# Quality heuristic constants — shared by quality_score (Spark) and
# duck_quality (oracle) so both engines read ONE definition.
QUALITY_W_DISTINCT = 0.5
QUALITY_W_LENGTH = 0.3
QUALITY_W_STOP = 0.2
QUALITY_LEN_NORM = 50.0


def quality_score(text_col: Column | str) -> Column:
    """Deterministic quality heuristic in [0, ~1]: rewards vocabulary
    diversity and moderate length, penalizes stopword share. Pure
    int-ratio arithmetic -> bit-exact across engines."""
    return quality_score_from_bag(bag_tokens(text_col))


def quality_score_from_bag(bag: Column) -> Column:
    """``quality_score`` over an already-tokenized bag column — for
    pipelines that tokenize once and feed several consumers (e.g.
    q_dedup_representatives shares one bag relation between the MinHash
    signature path and this score, saving a second split pass over
    every document)."""
    distinct_ratio = F.size(F.array_distinct(bag)).cast("double") / F.size(bag).cast(
        "double"
    )
    length_factor = F.least(
        F.size(bag).cast("double") / F.lit(QUALITY_LEN_NORM), F.lit(1.0)
    )
    return (
        F.lit(QUALITY_W_DISTINCT) * distinct_ratio
        + F.lit(QUALITY_W_LENGTH) * length_factor
        + F.lit(QUALITY_W_STOP) * (F.lit(1.0) - stopword_ratio(bag))
    )


def fingerprint(text_col: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — whitespace/order/duplication-insensitive exact-dup key."""
    canon = F.concat_ws(" ", F.array_sort(set_tokens(text_col)))
    return F.md5(canon.cast("binary"))


def word_ngrams(tokens_bag: Column, n: int) -> Column:
    """Word n-grams over an ordered token bag via zip_with on shifted
    slices.

    Deliberately NOT ``transform(sequence, i -> element_at(bag, i+k))``:
    a lambda that references the bag EXPRESSION re-evaluates it per
    element (no common-subexpression elimination inside higher-order
    lambdas), turning tokenization O(len) into O(len^2) per document —
    measured 30s/5k docs before this rewrite. Here the bag is referenced
    n times per document total. ``zip_with`` pads the shorter (shifted)
    side with nulls; ``F.concat`` propagates them, and the final filter
    drops the padded tail — also covering docs shorter than n.
    """
    sz = F.size(tokens_bag)
    grams = tokens_bag
    for k in range(1, n):
        shifted = F.slice(tokens_bag, k + 1, F.greatest(sz - k, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda g, t: F.concat(g, F.lit(" "), t)
        )
    return F.filter(grams, lambda g: g.isNotNull())


# ---- DuckDB oracle fragments (same constants, same arithmetic) ----

def duck_list(items: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{i}'" for i in items) + "]"


def duck_bag(text_ref: str = "text") -> str:
    return f"list_filter(string_split(lower({text_ref}), ' '), x -> x <> '')"


def duck_set(text_ref: str = "text") -> str:
    return f"list_distinct({duck_bag(text_ref)})"


def md5_prefix60(col: Column) -> Column:
    """60-bit integer hash of a string column: first 15 md5 hex chars,
    base-16 -> bigint. Engine-portable (md5 hex is identical everywhere,
    60 bits fit a signed long exactly); the join-key compression used by
    hashed decontamination and SimHash."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def duck_md5_prefix60(ref: str) -> str:
    """DuckDB mirror of ``md5_prefix60`` over a string expression."""
    return f"CAST(concat('0x', substr(md5({ref}), 1, 15)) AS BIGINT)"


def md5_prefix40(col: Column) -> Column:
    """40-bit integer hash (first 10 md5 hex chars): the narrow variant
    for operators that pack (hash, position) into ONE bigint —
    40 + 20 position bits stay well inside a signed long (winnowing's
    per-window argmin trick)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 10), 16, 10).cast(
        "bigint"
    )


def duck_md5_prefix40(ref: str) -> str:
    """DuckDB mirror of ``md5_prefix40`` over a string expression."""
    return f"CAST(concat('0x', substr(md5({ref}), 1, 10)) AS BIGINT)"


def duck_quality(bag_ref: str = "bag") -> str:
    """DuckDB mirror of ``quality_score`` over an already-computed bag
    column — the ONE oracle-side definition (weights, length norm, and
    STOPWORDS come from the same constants as the Spark side, so an
    edit there cannot silently desync an oracle)."""
    stop = duck_list(STOPWORDS)
    return (
        f"{QUALITY_W_DISTINCT} * (CAST(len(list_distinct({bag_ref})) AS DOUBLE)"
        f" / len({bag_ref}))"
        f" + {QUALITY_W_LENGTH} * least(len({bag_ref}) / {QUALITY_LEN_NORM}, 1.0)"
        f" + {QUALITY_W_STOP} * (1.0 - CAST(len(list_filter({bag_ref},"
        f" x -> list_contains({stop}, x))) AS DOUBLE) / len({bag_ref}))"
    )
