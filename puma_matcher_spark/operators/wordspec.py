"""Corpus word-specificity analysis (DocumentWordSpecAnalyser rebuild).

Reference: analyser/DocumentWordSpecAnalyser.scala:73-160 — compares each
word's IDF in the project corpus against its IDF in a reference English
corpus; words whose corpus IDF is much lower than their reference IDF are
domain-specific (spec distance = |log(N/df_corpus) − log(N_ref/df_ref)|,
:116-131) and become high-signal matching features.

Rebuild: two df aggregations + a join on the word key; the reference
corpus frequencies arrive as a (word, df) frame (broadcast — reference
dictionaries are bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def corpus_word_df(docs: DataFrame, text_col: str = "text", id_col: str = "document_version_id") -> DataFrame:
    """(word, df) document frequencies over a corpus."""
    from puma_matcher_spark.functions.text import exploded_tokens

    words = exploded_tokens(docs, text_col, id_col).select(
        "document_version_id", "word"
    ).distinct()
    return words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))


def word_spec_distance(
    corpus_df: DataFrame,
    corpus_docs: int | Column,
    reference_df: DataFrame,
    reference_docs: int | Column,
) -> DataFrame:
    """spec = |log(N/df) − log(N_ref/df_ref)| per word present in both
    corpora (DocumentWordSpecAnalyser.scala:116-131).

    The two N's may be ints or Columns — pass scalar-subquery columns
    (``df.scalar()``) so each corpus is scanned once by the real job
    rather than twice (plan-build count + execution)."""

    def _n(v: int | Column) -> Column:
        return v.cast("double") if isinstance(v, Column) else F.lit(float(v))

    ref = reference_df.select(
        "word", F.col("df").alias("ref_df")
    )
    joined = corpus_df.join(F.broadcast(ref), "word")
    corpus_idf = F.log(_n(corpus_docs) / F.col("df"))
    ref_idf = F.log(_n(reference_docs) / F.col("ref_df"))
    return joined.select(
        "word",
        "df",
        "ref_df",
        F.abs(corpus_idf - ref_idf).alias("spec_distance"),
    )
