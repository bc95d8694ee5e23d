"""Text-analysis operators: quality features, language ID, token stats,
fingerprinting — the per-document scoring pass of a training-data
pipeline.

Everything is row-local column arithmetic (no shuffle, no UDF): at
100 TB this pass is embarrassingly parallel and bound by scan speed.
Ratios are exact int/int divisions so results are reproducible
bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread
from ..functions.text import (
    STOPWORDS,
    normalize_text,
    stopword_hits,
    token_sum_len,
    tokenize,
)

# quality-score weights (arbitrary but fixed contract)
W_STOP, W_PUNCT, W_LEN = 0.5, 0.3, 0.2
IDEAL_TOKEN_LEN = 5.0


def quality_columns(text_col: str = "text", toks=None) -> list:
    """The quality-feature column expressions, exposed so a caller
    computing OTHER row-local doc features (e.g. the repetition stats)
    can put them in the SAME projection instead of joining two scans
    of the table back together on doc_id.  Pass ``toks`` to reuse an
    already-aliased token array (the tokenize HOF is non-cheap, so an
    upstream alias evaluates it once per row)."""
    toks = tokenize(F.col(text_col)) if toks is None else toks
    n_chars = F.length(text_col).cast("long")
    n_tokens = F.size(toks).cast("long")
    punct = F.length(F.regexp_replace(F.lower(F.col(text_col)), r"[a-z0-9\s]", "")).cast("long")
    en_hits = stopword_hits(toks, STOPWORDS["en"])
    avg_tok = token_sum_len(toks).cast("double") / n_tokens.cast("double")
    stop_ratio = en_hits.cast("double") / n_tokens.cast("double")
    punct_ratio = punct.cast("double") / n_chars.cast("double")
    score = (
        F.lit(W_STOP) * stop_ratio
        + F.lit(W_PUNCT) * (F.lit(1.0) - punct_ratio)
        + F.lit(W_LEN) * (F.lit(1.0) / (F.lit(1.0) + F.abs(avg_tok - F.lit(IDEAL_TOKEN_LEN))))
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        en_hits.alias("n_stopwords"),
        avg_tok.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    ]


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features + composite score.

    score = W_STOP*stopword_ratio + W_PUNCT*(1-punct_ratio)
          + W_LEN*(1/(1+|avg_token_len-IDEAL|)) — a length/punct/stopword
    heuristic in the spirit of C4/Gopher quality rules."""
    # CPU-dense row-local pass — spread single-split inputs across cores
    df = spread(df, id_col)
    return df.select(F.col(id_col), *quality_columns(text_col))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID with a fixed priority tie-break.

    Returns (id, predicted_lang, hit counts per language)."""
    toks = tokenize(F.col(text_col))
    hits = {lang: stopword_hits(toks, words) for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    df = spread(df, id_col)
    base = df.select(
        F.col(id_col), *[hits[lang].alias(f"hits_{lang}") for lang in langs]
    )
    # first language (in priority order) whose hits >= every other's
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    expr = expr.otherwise(F.lit(langs[0]))
    return base.withColumn("predicted_lang", expr)


def fingerprint_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int | None = None,
) -> DataFrame:
    """Group documents by md5 of normalized text (optionally a prefix —
    a cheap near-dup blocking key). Returns (fingerprint, n_docs, keep_id)."""
    norm = normalize_text(text_col)
    if prefix_chars:
        norm = F.substring(norm, 1, prefix_chars)
    return (
        df.groupBy(F.md5(norm).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )
