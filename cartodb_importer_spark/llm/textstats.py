"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting (SURVEY §2.3 north-star surface).

Everything here is pyspark.sql.functions built-ins — whole-stage codegen,
no Python in the row path — so a 100 TB documents table is one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-hit
# heuristic language identifier. Deliberately small: the operator's value is
# its shape (pure-SQL argmax over marker-hit counts), not lexicon size.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

TOKEN_RX = r"[a-z0-9]+"


def words(col: Column) -> Column:
    """Lowercased alphanumeric tokens (whitespace/punct-split)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), " "),
        lambda w: w != "",
    )


def token_count(col: Column) -> Column:
    """Whitespace-ish token count via regexp_count — one pass, no array."""
    return F.regexp_count(F.lower(col), F.lit(TOKEN_RX))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored count: alpha runs, digit runs, and isolated symbols each
    count as one token (a cheap proxy for tokenizer cost estimation)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, F.regexp_count(col, F.lit(r"[^\w\s]")) / n).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: w.isin(sw)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize too-short docs, heavy
    punctuation, and stopword-free (non-linguistic) text."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = 1 - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 10, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3, 4)


def _marker_filter(markers: list[str]):
    # NB: the lambda must take exactly one parameter — pyspark passes the
    # array index to a second parameter, which would shadow a default-arg
    # closure.
    return lambda w: w.isin(markers)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token array."""
    ws = words(col)
    return {
        lang: F.size(F.filter(ws, _marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Argmax language over marker hits; CJK characters short-circuit to
    'zh'; no hits at all -> 'und'. Deterministic tie-break by language code
    order via greatest-struct comparison."""
    scores = lang_scores(col)
    # struct (hits, neg-ordinal) so ties resolve to the alphabetically first
    packed = [
        F.struct(score.alias("hits"), F.lit(-i).alias("ord"), F.lit(lang).alias("lang"))
        for i, (lang, score) in enumerate(sorted(scores.items()))
    ]
    best = F.greatest(*packed)
    has_cjk = F.regexp_count(col, F.lit(r"[一-鿿]")) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
    )


def fingerprint(col: Column) -> Column:
    """Collision fingerprint: md5 of the sorted distinct token set — the
    classic key-collision method (case/word-order/duplicate-word
    insensitive)."""
    canon = F.array_join(F.array_sort(F.array_distinct(words(col))), " ")
    return F.md5(canon)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats column family to a documents DataFrame."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.length(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
