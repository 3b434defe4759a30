"""Lightweight NLP tagging (M7 stand-in).

Reference: Stanford CoreNLP ``pos()``/``ner()``/``lemma()`` columns with a
POS whitelist ``FW, MD, NN*, RP, PDT, UH, VB*`` + NER 'O'
(AdvancedInstrumentAnalyser.scala:553-571,
DocumentWordSpecAnalyser.scala:166-220).

CoreNLP/spaCy are not in this container; the *plumbing* (pandas-UDF
signature, whitelist filtering, explode-as-UDTF shape) is real and the
tagger is a deterministic suffix-rule heuristic clearly marked as a
stand-in — swap ``_heuristic_pos`` for ``spacy`` in production and
nothing else changes (SURVEY.md §7.4 accepts tagger divergence; gate with
labelled metrics, not exact match).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# reference whitelist (AdvancedInstrumentAnalyser.scala:553-554)
POS_WHITELIST = ("FW", "MD", "NN", "NNS", "NNP", "RP", "PDT", "UH", "VB", "VBD", "VBG", "VBN")

_DETERMINERS = {"the", "a", "an", "this", "that", "these", "those"}
_PREPOSITIONS = {"of", "in", "on", "at", "by", "for", "with", "from", "to", "as"}
_MODALS = {"can", "could", "will", "would", "shall", "should", "may", "might", "must"}


def _heuristic_pos(tok: str) -> str:
    """Deterministic suffix-rule tagger — STAND-IN for CoreNLP/spaCy."""
    if tok in _DETERMINERS:
        return "DT"
    if tok in _PREPOSITIONS:
        return "IN"
    if tok in _MODALS:
        return "MD"
    if tok.endswith("ing"):
        return "VBG"
    if tok.endswith("ed"):
        return "VBD"
    if tok.endswith("ly"):
        return "RB"
    if tok.endswith("s") and len(tok) > 3:
        return "NNS"
    return "NN"


@F.pandas_udf(ArrayType(StringType()))
def pos_tags(tokens: pd.Series) -> pd.Series:
    """Arrow-batched POS tagging of token arrays."""
    return tokens.map(
        lambda arr: [_heuristic_pos(t) for t in arr] if arr is not None else None
    )


@F.pandas_udf(ArrayType(StringType()))
def ner_tags(tokens: pd.Series) -> pd.Series:
    """Arrow-batched NER tagging — STAND-IN heuristic (capitalised,
    non-sentence-initial tokens → ENTITY, else O, the reference's 'O'
    whitelist class).  Swap for spaCy NER in production; the plumbing
    (signature, whitelist filter shape) is identical."""

    def tag(arr):
        if arr is None:
            return None
        out = []
        for i, t in enumerate(arr):
            if i > 0 and t[:1].isupper():
                out.append("ENTITY")
            else:
                out.append("O")
        return out

    return tokens.map(tag)


def filter_by_pos(
    docs: DataFrame,
    tokens_col: str = "words",
    whitelist: tuple[str, ...] = POS_WHITELIST,
) -> DataFrame:
    """Keep only whitelist-tagged tokens (zip tokens with tags, filter,
    project back) — the reference's word-model pruning."""
    tagged = docs.withColumn("_tags", pos_tags(F.col(tokens_col)))
    wl = F.array(*[F.lit(t) for t in whitelist])
    zipped = F.arrays_zip(F.col(tokens_col), F.col("_tags"))
    kept = F.filter(zipped, lambda x: F.array_contains(wl, x["_tags"]))
    return tagged.withColumn(
        "content_words", F.transform(kept, lambda x: x[tokens_col])
    ).drop("_tags")
