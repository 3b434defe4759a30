"""Corpus retrieval operators: BM25 ranking and inverted-index phrase
lookup.

Additive to the reference (SURVEY.md §2.12).  A training-data pipeline
needs in-corpus retrieval constantly — "find the documents that look
like this benchmark prompt", "which sources contain this phrase" — and
the scalable form is an inverted index + a length-normalised lexical
scorer, not a regex scan of every document.

Both operators are pure Catalyst compositions:

* :func:`bm25_scores` — Okapi BM25 over whitespace tokens.  One tf
  aggregate over the (small, broadcastable) query-term postings, df and
  average-doc-length folded in as scalar subqueries; the per-term sum
  is one final groupBy.  No full-corpus sort: top-k is orderBy+limit,
  which Spark executes as per-partition TakeOrdered + driver merge.
* :func:`phrase_lookup` — the phrase's token count fixes the n-gram
  width; contiguous grams are formed IN-ROW over each document's token
  array and counted map-side, so the only shuffle aggregates the
  matching documents — never a corpus scan with a LIKE, never a
  token-row explode.

At 100 TB the shingle/posting frames are precomputed tables bucketed by
term; both operators then run without touching document text at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from puma_matcher_spark.functions.rounding import pround
from puma_matcher_spark.llmdata.textstats import tokens


def doc_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-cased whitespace token postings: (doc_id, tok) — the shared
    first stage of every lexical operator here and in queries.py."""
    return docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )


_doc_tokens = doc_tokens  # backwards-compatible internal name


def doc_tf_df(
    docs: DataFrame, text_col: str = "text", persist_tf: bool = False
) -> DataFrame:
    """Per-doc term frequencies joined with document frequencies:
    (doc_id, tok, tf, df) — the postings table TF-IDF scorers build on.

    ``persist_tf=True`` caches the tf frame, which both join sides
    otherwise re-derive from the document scan (df aggregates OVER tf,
    so the tokenize→explode→tf-aggregate chain appears once per side —
    2 scans / 2 generates in the plan): one tokenize pass instead of
    two.  Exported callers opt in; the library default stays False so
    ad-hoc callers choose the cache footprint explicitly."""
    tf = doc_tokens(docs, text_col).groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    if persist_tf:
        from puma_matcher_spark.functions.caching import persist_rotating

        tf = persist_rotating(tf)
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return tf.join(df, "tok")


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    persist_postings: bool = False,
) -> DataFrame:
    """Okapi BM25 score per document for a bag of query terms.

    idf uses the standard Robertson form log10((N - df + 0.5)/(df + 0.5))
    clamped at 0; doc length and its corpus average are whitespace token
    counts.  Output: (doc_id, matched_terms, score) for docs matching at
    least one term.

    ``persist_postings=True`` caches the exploded token frame, which
    four plan branches otherwise each re-derive from the document scan
    (dl, the avgdl scalar, tf, and df-via-tf — the r11 plan audit
    counted 4 explode(tokens(...)) generates over 5 scans per run):
    one tokenize pass instead of four.  The exported ``bm25_search``
    passes True since r11 (oracle parity + twin-equality proven); the
    library default stays False so ad-hoc callers opt in to the cache
    footprint explicitly."""
    toks = _doc_tokens(docs, text_col)
    if persist_postings:
        from puma_matcher_spark.functions.caching import persist_rotating

        toks = persist_rotating(toks)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n")).scalar()
    avgdl = dl.agg(F.avg("dl").alias("a")).scalar()

    qt = [t.lower() for t in query_terms]
    tf = (
        toks.where(F.col("tok").isin(qt))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.greatest(
        F.lit(0.0),
        F.log10((n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5)),
    )
    scored = (
        tf.join(df, "tok")
        .join(dl, "doc_id")
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
        pround(F.sum("term_score"), 4).alias("score"),
    )


def phrase_lookup(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact-phrase containment: the phrase's token count fixes the
    n-gram width, contiguous grams are formed in-row over the token
    array and matches counted map-side.
    Output: (doc_id, n_occurrences).
    """
    terms = [t for t in phrase.lower().split(" ") if t]
    n = len(terms)
    if n == 0:
        # an empty/whitespace-only phrase matches nothing — the r11
        # in-row shape would otherwise raise IndexError at plan-build
        # (terms[0]); the old lead()-window shape returned no rows, so
        # keep that contract with an empty (doc_id, n_occurrences) frame
        return (
            docs.select("doc_id")
            .limit(0)
            .withColumn("n_occurrences", F.lit(0).cast("long"))
        )

    # Contiguous n-grams IN-ROW over the token array (r11): the previous
    # shape posexploded every token and formed grams with lead() windows,
    # paying a full token-row shuffle + per-doc sort just to look at
    # adjacent tokens that were already adjacent in the array.  slice()
    # over the array yields the same contiguous (non-distinct) grams
    # map-side; the only remaining exchange is the per-doc aggregation
    # of small (doc_id, count) rows.  Result-identical: a trailing
    # partial gram (the lead()-NULL rows the old shape produced) joins
    # < n tokens with < n-1 spaces and can never equal an n-token
    # phrase, and the when() guard reproduces the no-rows outcome for
    # docs with fewer than n tokens (sequence() would otherwise run
    # descending).  The token array is projected to a column FIRST —
    # higher-order functions are interpreted, so an inline tokens()
    # inside the filter() lambda is re-split once per gram position
    # (measured 4x slower than the window shape at sf0.1); as an
    # attribute it is computed once per row, and the zero-match filter
    # sits AFTER the aggregation so predicate pushdown cannot duplicate
    # the counting expression below the projection.  A position matches
    # via n element_at comparisons against the phrase terms (tokens
    # contain no spaces, so tokenwise equality ⟺ equality of the
    # space-joined gram) — no slice/concat allocation per position.
    tk = F.col("_tk")

    def _match_at(i):
        cond = F.element_at(tk, i) == F.lit(terms[0])
        for j in range(1, n):
            cond = cond & (F.element_at(tk, i + j) == F.lit(terms[j]))
        return cond

    hits = F.filter(F.sequence(F.lit(1), F.size(tk) - n + 1), _match_at)
    cnt = F.when(F.size(tk) >= n, F.size(hits)).otherwise(F.lit(0))
    return (
        docs.select("doc_id", tokens(F.lower(F.col(text_col))).alias("_tk"))
        .select("doc_id", cnt.alias("_n"))
        .groupBy("doc_id")
        .agg(F.sum("_n").cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )
