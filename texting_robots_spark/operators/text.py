"""Text-analysis operators for training-data pipelines over ``documents``.

- quality features (token counts, distinct ratio, mean token length):
  native expressions, DuckDB-oracle-checkable.
- language ID: 29-language character-bigram profile model as a
  vectorized pandas UDF (profiles embedded as data; hash-oracled via
  the closed-form replace-count trick — see below).
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
# language ID: character-bigram profiles over 29 languages (Latin,
# Cyrillic, Greek, Arabic, Hebrew, Devanagari, CJK, Thai scripts),
# embedded as data. Each profile is 12 rank-weighted bigrams drawn from
# well-known character/digraph frequency facts for the language (public
# linguistic knowledge), biased toward DISTINCTIVE digraphs (ñ/ó es,
# å/ä/ö sv, ı/ş/ğ tr, ij/ui nl, æ/ø da, ...) so related languages
# separate. Scoring: sum over profile bigrams of count(bigram) *
# (12 - rank); highest positive score wins, ties to the first language
# in sorted order; empty/zero-score text -> 'und'.
#
# Invariants the driver oracle depends on (pinned in pytest): every
# bigram is exactly two DISTINCT codepoints (so overlapping-occurrence
# counts equal replace-based counts: (len - len(replace))/2 — the
# closed-form DuckDB replay) and contains no single-quote.
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    # Latin-script
    "en": ("th", "he", "in", "er", "an", "re", "nd", "at", "on", " t", "en", "es"),
    "de": ("ch", "ei", "ie", "sc", "un", "de", "er", "en", "zu", "au", "üb", "ät"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "ou", "qu", "ai", "ur", "an"),
    "es": ("de", "la", "en", "el", "os", "ón", "ue", " e", "ar", "za", "ña", "es"),
    "pt": ("de", "os", "ão", "es", "ra", "em", "co", "nt", "do", "da", "ad", "se"),
    "it": ("di", "la", "to", "zi", "gl", "gi", "ch", "co", "el", "re", "un", "ta"),
    "nl": ("en", "de", "ij", "oe", "ui", "sc", "ge", "et", "an", "he", "va", "er"),
    "sv": ("en", "ar", "oc", "fö", "ör", "äv", "öv", "sj", "ck", "et", "an", "de"),
    "da": ("er", "en", "de", "et", "og", "ed", "ær", "øj", "på", "il", "af", "ke"),
    "no": ("er", "en", "et", "og", "å ", "ør", "ei", "ik", "sk", "om", "av", "ke"),
    "fi": ("en", "in", "an", "is", "on", "ai", "ta", "st", "sa", "tä", "kä", "lä"),
    "pl": ("ie", "ni", "po", "rz", "sz", "cz", "na", "wi", "ow", "yc", "ek", "dz"),
    "cs": ("st", "ní", "po", "ov", "ně", "je", "na", "ro", "en", "ře", "ch", "at"),
    "tr": ("ar", "la", "ın", "ır", "bi", "ği", "ş ", "çe", "ı ", "da", "le", "ka"),
    "ro": ("de", "re", "in", "ul", "at", "ar", "ea", "es", "tr", "ca", "or", "ță"),
    "hu": ("el", "gy", "sz", "en", "et", "eg", "te", "az", "me", "ek", "es", "ha"),
    "id": ("an", "ng", "di", "ka", "me", "da", "be", "ya", "la", "se", "pe", "ta"),
    "vi": ("ng", "nh", "th", "ch", "uy", "ươ", "iê", "ôn", "ạn", "ượ", "ấy", "ải"),
    "sw": ("wa", "ku", "na", "ya", "ma", "ni", "ka", "za", "la", "ki", "mb", "ch"),
    # Cyrillic
    "ru": ("но", "на", "ен", "то", "ст", "ов", "ни", "ра", "во", "ко", "ре", "ан"),
    "uk": ("на", "ни", "ст", "ів", "ти", "не", "по", "ов", "ен", "ня", "ко", "за"),
    # Greek
    "el": ("αι", "τα", "ου", "το", "ης", "αν", "κα", "ει", "να", "ερ", "ος", "τη"),
    # RTL
    "ar": ("ال", "ان", "ين", "ون", "ما", "من", "لا", "في", "ها", "ات", "عل", "ة "),
    "he": ("ים", "ות", "על", "לא", "את", "ור", "בי", "ית", "של", "אל", "הם", "שי"),
    # Indic
    "hi": ("का", "के", "की", "है", "ने", "से", "ें", "ों", "ता", "ार", "िय", "हा"),
    # CJK + Thai
    "ja": ("して", "てい", "いる", "ます", "です", "った", "ない", "こと", "から", "する", "れて", "とい"),
    "ko": ("니다", "하는", "습니", "으로", "에서", "하고", "있다", "것이", "지만", "하지", "는데", "들이"),
    "zh": ("的是", "我们", "他们", "这个", "是一", "中国", "一个", "人民", "没有", "自己", "什么", "时候"),
    "th": ("กา", "าร", "ที", "ใน", "มา", "คว", "วา", "ปร", "ระ", "ด้", "ไม", "เป"),
}


def lang_id_udf():
    # inverted index bigram -> [(lang, weight)] (round 7): scoring walks
    # the document's bigram counts ONCE and touches only the few
    # languages that claim each bigram, instead of re-scanning the
    # counts dict once per language (29x). Winner selection is identical
    # to the old per-language loop: highest positive score, ties to the
    # first language in sorted order, zero/empty -> 'und'.
    index: dict = {}
    for lang, bgs in _LANG_PROFILES.items():
        for i, bg in enumerate(bgs):
            index.setdefault(bg, []).append((lang, len(bgs) - i))

    @F.pandas_udf(T.StringType())
    def lang_id(text: pd.Series) -> pd.Series:
        def guess(t):
            if not t:
                return "und"
            t = t.lower()
            counts = Counter(t[i : i + 2] for i in range(len(t) - 1))
            scores: dict = {}
            for bg, c in counts.items():
                for lang, wt in index.get(bg, ()):
                    scores[lang] = scores.get(lang, 0) + c * wt
            if not scores:
                return "und"
            # min over (-score, lang) == "highest score, ties to the
            # sorted-first language" — the old loop's exact pick
            score, lang = min((-s, lang) for lang, s in scores.items())
            return lang if -score > 0 else "und"

        return text.map(guess)

    return lang_id


def add_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("lang_guess", lang_id_udf()(F.col(text_col)))
