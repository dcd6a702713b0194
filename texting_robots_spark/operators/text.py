"""Text-analysis operators for training-data pipelines over ``documents``.

- quality features (token counts, distinct ratio, mean token length):
  native expressions, DuckDB-oracle-checkable.
- language ID: character-bigram profile heuristic as a vectorized pandas
  UDF (no SQL equivalent -> rows-only oracle).
- document fingerprints: md5 (oracle-checkable) and a polynomial rolling
  hash over tokens (native expressions via aggregate()).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import tokenize

__all__ = [
    "quality_features",
    "repetition_features",
    "rolling_fingerprint",
    "lang_id_udf",
    "add_lang_id",
]


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality-scoring features, all native expressions."""
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    distinct_n = F.size(F.array_distinct(toks))
    char_len = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        distinct_n.alias("n_distinct_tokens"),
        F.round(distinct_n.cast("double") / F.greatest(n, F.lit(1)), 6).alias(
            "distinct_ratio"
        ),
        F.round(
            (char_len - n + 1).cast("double") / F.greatest(n, F.lit(1)), 6
        ).alias("mean_token_len"),
        char_len.alias("n_chars_measured"),
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/RefinedWeb-style repetition signals: the fraction of
    duplicate tokens / word-bigrams / word-trigrams per document (high
    values flag boilerplate and degenerate generations — standard
    training-data quality filters from the published Gopher and
    RefinedWeb pipelines).

    All native expressions, no shuffle, no UDF: n-grams are sep-joined
    strings over token-array slices (O(tokens) per row with constant
    n-gram width) deduplicated with ``array_distinct`` — the exact
    construction DuckDB replays with range/list_transform/list_distinct
    in the driver's ``repetition_features`` oracle. dup_X_frac =
    1 - distinct/total, 0.0 when the document has no n-grams of that
    order. The \\x1f separator is not \\s, so it cannot collide with
    the whitespace tokenizer's output boundaries in practice.
    """
    toks = tokenize(F.col(text_col))
    n = F.size(toks)

    def _dup_frac(arr):
        cnt = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        return F.round(
            F.when(cnt > 0, (cnt - nd).cast("double") / cnt).otherwise(F.lit(0.0)),
            6,
        )

    def _ngrams(order: int):
        idx = F.sequence(F.lit(1), n - order + 1)
        arr = F.transform(
            idx, lambda i: F.concat_ws("\x1f", F.slice(toks, i, order))
        )
        return F.when(n >= order, arr).otherwise(
            F.array().cast("array<string>")
        )

    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        _dup_frac(toks).alias("dup_token_frac"),
        _dup_frac(_ngrams(2)).alias("dup_bigram_frac"),
        _dup_frac(_ngrams(3)).alias("dup_trigram_frac"),
    )


def rolling_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Polynomial rolling hash over token hashes:
    fp = fold(tokens, 0, (acc, t) -> (acc*31 + h(t)) mod 2^31-1) with
    h(t) = base_hash(t) mod 2^31-1 — native aggregate(), order-sensitive
    by construction, bounded so ANSI int64 arithmetic never overflows.
    ``base_hash='md5'`` (dedup.base_hash_expr) is the DuckDB-checkable
    variant; xxhash64 stays the production default."""
    from .dedup import base_hash_expr

    m = F.lit((1 << 31) - 1)
    toks = tokenize(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(31).cast("long") + F.pmod(base_hash_expr(t, base_hash), m),
            m,
        ),
    )
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.md5(F.col(text_col)).alias("md5_fingerprint"),
    )


# ---------------------------------------------------------------------------
# language ID: tiny character-bigram profiles (deterministic heuristic).
# A real model would be plugged in the same way — this keeps the Spark
# plumbing (vectorized UDF, broadcastable profiles) real and tested.
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    "en": ("th", "he", "in", "er", "an", "re", " t", "on", "at", "es"),
    "de": ("en", "er", "ch", "de", " d", "ei", "te", "in", "nd", "ie"),
    "fr": ("es", "le", "de", " d", "en", "re", " l", "nt", "on", "er"),
    "es": ("de", " d", "es", "en", "el", " e", "la", "os", " c", "ar"),
    "zh": ("zh", "ng", "sh", " x", " z", "ia", "ua", "ji", "xi", "an"),
}


def lang_id_udf():
    profiles = {
        lang: {bg: 10 - i for i, bg in enumerate(bgs)}
        for lang, bgs in _LANG_PROFILES.items()
    }

    @F.pandas_udf(T.StringType())
    def lang_id(text: pd.Series) -> pd.Series:
        def guess(t):
            if not t:
                return "und"
            t = t.lower()
            counts = Counter(t[i : i + 2] for i in range(len(t) - 1))
            best_lang, best_score = "und", 0
            for lang in sorted(profiles):
                w = profiles[lang]
                score = sum(c * w[bg] for bg, c in counts.items() if bg in w)
                if score > best_score:
                    best_lang, best_score = lang, score
            return best_lang

        return text.map(guess)

    return lang_id


def add_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("lang_guess", lang_id_udf()(F.col(text_col)))
