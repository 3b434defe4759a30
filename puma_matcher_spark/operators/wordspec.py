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

from pyspark.sql import DataFrame
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
    corpus_docs: int,
    reference_df: DataFrame,
    reference_docs: int,
) -> DataFrame:
    """spec = |log(N/df) − log(N_ref/df_ref)| per word present in both
    corpora (DocumentWordSpecAnalyser.scala:116-131)."""
    ref = reference_df.select(
        "word", F.col("df").alias("ref_df")
    )
    joined = corpus_df.join(F.broadcast(ref), "word")
    corpus_idf = F.log(F.lit(float(corpus_docs)) / F.col("df"))
    ref_idf = F.log(F.lit(float(reference_docs)) / F.col("ref_df"))
    return joined.select(
        "word",
        "df",
        "ref_df",
        F.abs(corpus_idf - ref_idf).alias("spec_distance"),
    )
