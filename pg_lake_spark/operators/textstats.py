"""Text analysis operators: token counting, quality scoring,
language-ID, document fingerprinting.

All pure Column expressions (codegen'd, zero Python in the hot path);
at 100 TB these are embarrassingly parallel map stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic. Deterministic and engine-portable — the same
#: lists are inlined into the DuckDB oracle SQL.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


def words(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), r"\s+")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """BPE-ish token estimate: count of word-piece matches
    (letter runs, digit runs, punctuation singletons) — a deterministic
    stand-in for a real tokenizer's token count."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, word stats, punct/space ratios."""
    text = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(text)
    ws = words(text)
    n_words = F.size(ws)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(text, r"\s", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_words": n_words.cast("bigint"),
        "avg_word_len": (n_chars - n_spaces).cast("double") / n_words,
        "punct_ratio": n_punct.cast("double") / n_chars,
        "space_ratio": n_spaces.cast("double") / n_chars,
    }


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language profile."""
    ws = words(text)
    out = {}
    for lang, stop in LANG_PROFILES.items():
        out[lang] = F.size(F.array_intersect(ws, F.array(*[F.lit(s) for s in stop]))).cast("int")
    return out


def lang_id(text: Column | str) -> Column:
    """Predicted language: argmax of profile scores, 'und' when all zero.

    Ties break by profile order (en > de > fr) — deterministic.
    """
    scores = lang_scores(text)
    mx = F.greatest(*scores.values())
    out = F.lit("und")
    # earlier profiles win ties → apply later profiles first, overwrite with earlier
    for lang in reversed(list(scores)):
        out = F.when((mx > 0) & (scores[lang] == mx), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed, punctuation stripped). Two docs
    differing only in case/spacing/punctuation collide — the standard
    first pass before near-dup detection."""
    text = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " "))
    return F.md5(norm)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All text-analysis features in one map-only projection."""
    feats = quality_features(text_col)
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in feats.items()],
        token_count_ws(text_col).cast("bigint").alias("n_tokens_ws"),
        token_count_bpe_ish(text_col).cast("bigint").alias("n_tokens_bpe"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )
