"""Text-analysis operators for the training-data pipeline plane.

All pure Catalyst expressions (split / higher-order array functions /
md5) — no Python UDFs, so the whole plan stays in whole-stage codegen and
scales linearly with input splits.  Operates on the ``documents`` table
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from puma_matcher_spark.functions.rounding import pround

# Tiny English function-word list for the n-gram/stopword language heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are",
    "for", "on", "with", "by", "at", "from", "as", "that", "this", "it",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + quality scoring (length / distinct-ratio / stopword
    ratio).  The distinct-token ratio is a cheap lexical-diversity proxy;
    the stopword ratio feeds language ID and boilerplate detection."""
    toks = tokens(F.col(text_col))
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("token_count"),
        F.length(text_col).cast("long").alias("char_count"),
        pround(n_distinct / n_tokens, 4).alias("distinct_ratio"),
        pround(n_stop / n_tokens, 4).alias("stopword_ratio"),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text", threshold: float = 0.03) -> DataFrame:
    """Heuristic language ID: English function-word hit ratio."""
    toks = tokens(F.col(text_col))
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))) / F.size(toks)
    return docs.select(
        "doc_id",
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk")).alias(
            "predicted_lang"
        ),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the lower-cased, whitespace-normalised
    text (the exact-dedup key).  At 100 TB this is the map-side-cheapest
    possible content key — one pass, no shuffle until the dedup groupBy."""
    normalised = F.concat_ws(" ", tokens(F.lower(F.col(text_col))))
    return docs.select(
        "doc_id", F.md5(normalised).alias("fingerprint")
    )


# Pre-tokenizer shape of BPE vocabularies: letter runs, digit runs, and
# individual punctuation marks.  Deliberately regex-only (identical RE2/
# Java semantics) so the count is computable in any engine.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def with_bpe_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting for training-data budgeting: whitespace words plus
    a BPE-ish pre-tokenizer count (the unit LLM data pipelines budget
    by).  Pure ``regexp_extract_all`` — map-side, no shuffle, linear at
    any corpus size."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    return docs.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).cast("long").alias("word_count"),
        F.size(pieces).cast("long").alias("bpe_token_count"),
    )
