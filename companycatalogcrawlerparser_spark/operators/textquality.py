"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure native-column expressions (regexp counts, length arithmetic) so
they are portable to the DuckDB oracle and stay inside whole-stage codegen
at 100 TB scan scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalized

EN_STOPWORDS = [
    "the", "and", "of", "to", "in", "is", "for", "with", "on", "that",
]
RU_STOPWORDS = [
    "и", "в", "не", "на", "что", "с", "по", "как", "это", "для",
]


def _char_count(text, pattern: str) -> Column:
    """Number of characters matching the class: removing the matches and
    diffing lengths (identical semantics in Spark and DuckDB)."""
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


def _word_hits(text, words) -> Column:
    """Occurrences of any stopword as a whitespace-delimited token over the
    normalized text (padded-spaces trick — ANSI-portable, no \\b)."""
    padded = F.concat(F.lit(" "), normalized(text), F.lit(" "))
    total = F.lit(0)
    for w in words:
        occ = (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))
        ) / F.lit(len(w) + 2)
        total = total + occ
    return total.cast("long")


def latin_chars(text) -> Column:
    return _char_count(text, "[A-Za-z]")


def cyrillic_chars(text) -> Column:
    return _char_count(text, "[А-Яа-яЁё]")


def predict_lang(text) -> Column:
    """n-gram-free heuristic language ID: script dominance, stopword hits
    as the tie-breaker, 'unknown' when neither script appears."""
    lat = latin_chars(text)
    cyr = cyrillic_chars(text)
    en_hits = _word_hits(text, EN_STOPWORDS)
    ru_hits = _word_hits(text, RU_STOPWORDS)
    return (
        F.when(cyr > lat, F.lit("ru"))
        .when(lat > cyr, F.lit("en"))
        .when(ru_hits > en_hits, F.lit("ru"))
        .when(en_hits > ru_hits, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def token_count(text) -> Column:
    """Whitespace tokens of the trimmed text (0 for blank)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish proxy: count of maximal digit / letter / punct runs
    (regex segmentation as a cheap token estimate for budget math).
    Each run collapses to one marker char, then markers are counted."""
    t = normalized(text)
    marked = F.regexp_replace(t, r"[0-9]+|[a-z\u0430-\u044f\u0451]+|[^0-9a-z\u0430-\u044f\u0451 ]+", "#")
    return (
        F.length(marked) - F.length(F.replace(marked, F.lit("#"), F.lit("")))
    ).cast("long")


def quality_features(text) -> dict:
    """Quality-scoring features: returns named Columns."""
    n = F.length(text).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    alpha = (_char_count(text, "[A-Za-zА-Яа-яЁё]")).cast("double")
    digits = _char_count(text, "[0-9]").cast("double")
    punct = _char_count(text, r"[.,;:!?()\[\]«»\"']").cast("double")
    toks = token_count(text).cast("double")
    stop = (_word_hits(text, EN_STOPWORDS) + _word_hits(text, RU_STOPWORDS)).cast("double")
    return {
        "n_chars": n.cast("long"),
        "alpha_ratio": F.round(alpha / safe_n, 6),
        "digit_ratio": F.round(digits / safe_n, 6),
        "punct_ratio": F.round(punct / safe_n, 6),
        "mean_word_len": F.round(alpha / F.greatest(toks, F.lit(1.0)), 6),
        "stopword_ratio": F.round(stop / F.greatest(toks, F.lit(1.0)), 6),
    }


def quality_score(text) -> Column:
    """Composite [0,1] quality score: rewards alpha density and stopword
    presence, penalizes digit/punct domination and tiny docs."""
    f = quality_features(text)
    toks = token_count(text).cast("double")
    score = (
        F.lit(0.4) * f["alpha_ratio"]
        + F.lit(0.3) * F.least(f["stopword_ratio"] * 2, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["digit_ratio"] * 4, F.lit(1.0)))
        + F.lit(0.1) * F.least(toks / F.lit(100.0), F.lit(1.0))
    )
    return F.round(score, 6)


def fingerprint(text) -> Column:
    """Stable document fingerprint: md5 of the normalized text (exact-dedup
    key; cheap, portable)."""
    return F.md5(normalized(text))


def winnow_fingerprints(text, k: int = 8, window: int = 4) -> Column:
    """Winnowing-style selective fingerprints: from the k-gram hash
    sequence keep each window's minimum (array<string> of md5 prefixes).
    Native arrays only — the standard local-min sketch for plagiarism-style
    matching."""
    from .dedup import bind_once, normalized as _norm

    # two binds (see dedup.bind_once): the normalized text would re-run
    # its regex per gram position, and the grams array would re-hash the
    # ENTIRE doc per window — O(n²) md5 calls per doc without them
    def per_t(t):
        n = F.length(t)
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
        grams = F.transform(
            idx, lambda i: F.substring(F.md5(F.substring(t, i, F.lit(k))), 1, 8)
        )

        def per_g(g):
            nwin = F.greatest(F.size(g) - F.lit(window - 1), F.lit(1))
            wins = F.sequence(F.lit(0), nwin - F.lit(1))
            return F.array_distinct(
                F.transform(wins, lambda w: F.array_min(F.slice(g, w + 1, window)))
            )

        return bind_once(grams, per_g)

    return bind_once(_norm(text), per_t)
