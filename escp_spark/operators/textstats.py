"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst (regexp/array/agg built-ins) —
each is reproducible in ANSI SQL for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS_EXPR = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"

# Tiny per-language stopword lists for the n-gram/stopword-vote heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def token_count_expr(text_col: str):
    return F.size(F.expr(TOKENS_EXPR.format(col=text_col)))


def langid_scores(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: per language, the fraction of tokens
    that are marker words; prediction = argmax (ties → 'und' undefined).
    A real pipeline swaps in charset n-gram profiles; the operator shape
    (explode → conditional agg → greatest/argmax) is the same."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.expr(TOKENS_EXPR.format(col=text_col))).alias("term"),
    )
    aggs = [
        F.avg(F.col("term").isin(ws).cast("double")).alias(f"score_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]
    scored = toks.groupBy(id_col).agg(*aggs)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, "und")
    for l in langs:  # first language hitting the max wins (stable order)
        pred = pred.when(F.col(f"score_{l}") == best, l)
    return scored.select(
        id_col,
        *[F.round(f"score_{l}", 6).alias(f"score_{l}") for l in langs],
        pred.otherwise("und").alias("lang_pred"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation and
    stopword ratios, uppercase ratio — the usual pre-training filters."""
    toks = F.expr(TOKENS_EXPR.format(col=text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"))
    )
    upper = n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("chars_per_token"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(upper / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
    )


def doc_fingerprints(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of raw text, md5 of the normalized token
    stream (whitespace/case-insensitive near-exact dedup key), token
    count, xxhash64 shard key."""
    toks = F.expr(TOKENS_EXPR.format(col=text_col))
    return df.select(
        F.col(id_col),
        F.md5(text_col).alias("md5_raw"),
        F.md5(F.array_join(toks, " ")).alias("md5_normtok"),
        F.size(toks).alias("n_tokens"),
        F.xxhash64(text_col).alias("shard_key"),
    )
