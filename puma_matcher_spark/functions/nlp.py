"""Lightweight NLP tagging (M7) with a pluggable real-tagger backend.

Reference: Stanford CoreNLP ``pos()``/``ner()``/``lemma()`` columns with a
POS whitelist ``FW, MD, NN*, RP, PDT, UH, VB*`` + NER 'O'
(AdvancedInstrumentAnalyser.scala:553-571,
DocumentWordSpecAnalyser.scala:166-220).

Three backends behind the same pandas-UDF signatures, selected at runtime:

* ``heuristic`` — deterministic suffix-rule stand-ins (always available).
  Accuracy-gated on a hand-tagged fixture (tests/test_nlp.py)
  per SURVEY.md §7.4 — tagger divergence is expected, gate with labelled
  metrics, not exact match.
* ``perceptron`` — the vendored averaged-perceptron statistical POS
  tagger (functions/perceptron.py, weights shipped in data/) — a real
  trained tagger that runs in THIS container, closing the M7 gap the
  missing spaCy left.  POS only; lemma/NER fall back to the rule
  kernels under this backend.
* ``spacy`` — a full statistical tagger/lemmatiser/NER, used
  automatically when the package AND an English model are importable on
  the executors.  Tokens are fed pre-tokenised (``spacy.tokens.Doc``) so
  positions/whitelist plumbing is byte-identical across backends.

``PUMA_NLP_BACKEND`` pins the choice (``heuristic`` | ``perceptron`` |
``spacy`` | ``auto``, default auto → spacy when loadable, else
perceptron when its weights file is present, else heuristic); a forced
backend that is unavailable in the env falls back down that chain
rather than failing the pipeline.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# reference whitelist (AdvancedInstrumentAnalyser.scala:553-554,
# DocumentWordSpecAnalyser.scala:170)
POS_WHITELIST = (
    "FW", "MD", "NN", "NNS", "NNP", "NNPS", "RP", "PDT", "UH",
    "VB", "VBD", "VBG", "VBN", "VBP", "VBZ",
)

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


# ---- backend selection -----------------------------------------------------

_SPACY_UNSET = object()
_SPACY_NLP = _SPACY_UNSET


def _load_spacy():
    """The loaded spaCy English pipeline, or None when the package or its
    model is absent (memoized; evaluated lazily on each executor)."""
    global _SPACY_NLP
    if _SPACY_NLP is _SPACY_UNSET:
        try:
            import spacy

            try:
                _SPACY_NLP = spacy.load("en_core_web_sm", exclude=["parser"])
            except Exception:
                _SPACY_NLP = None
        except ImportError:
            _SPACY_NLP = None
    return _SPACY_NLP


def _load_perceptron():
    """The vendored averaged-perceptron tagger, or None when its weights
    file is absent (memoized in functions.perceptron)."""
    from puma_matcher_spark.functions.perceptron import load_default

    return load_default()


def nlp_backend() -> str:
    """Resolve the active tagging backend.  'auto' prefers the real
    taggers: spacy when loadable, else the vendored perceptron, else the
    rule heuristics; a forced unavailable backend degrades down the same
    chain instead of failing."""
    want = os.environ.get("PUMA_NLP_BACKEND", "auto")
    if want == "heuristic":
        return "heuristic"
    if want not in ("spacy", "perceptron", "auto"):
        raise ValueError(f"unknown PUMA_NLP_BACKEND: {want!r}")
    if want in ("spacy", "auto") and _load_spacy() is not None:
        return "spacy"
    # forced spacy without the package degrades to the next REAL tagger
    if _load_perceptron() is not None:
        return "perceptron"
    return "heuristic"


def _spacy_doc(nlp, arr):
    """Run the pipeline on a pre-tokenised array (positions preserved)."""
    from spacy.tokens import Doc

    doc = Doc(nlp.vocab, words=list(arr))
    for _name, proc in nlp.pipeline:
        doc = proc(doc)
    return doc


def _resolve(backend: str | None) -> str:
    """The backend name to execute with ('spacy'/'perceptron'/
    'heuristic').  ``backend`` pins the choice but still degrades when
    the pinned engine is unavailable; None defers to the env."""
    want = backend or nlp_backend()
    if want == "spacy" and _load_spacy() is not None:
        return "spacy"
    if want in ("spacy", "perceptron") and _load_perceptron() is not None:
        return "perceptron"
    return "heuristic"


def _pos_batch(arr, backend: str | None = None):
    if arr is None:
        return None
    how = _resolve(backend)
    if how == "spacy":
        return [t.tag_ or "NN" for t in _spacy_doc(_load_spacy(), arr)]
    if how == "perceptron":
        return _load_perceptron().tag(list(arr))
    return [_heuristic_pos(t) for t in arr]


def _load_perceptron_ner():
    from puma_matcher_spark.functions.perceptron import load_default_ner

    return load_default_ner()


def _load_lemmatizer():
    from puma_matcher_spark.functions.lemmatizer import load_default

    return load_default()


def _ner_batch(arr, backend: str | None = None):
    if arr is None:
        return None
    how = _resolve(backend)
    if how == "spacy":
        return [
            t.ent_type_ or "O" for t in _spacy_doc(_load_spacy(), arr)
        ]
    if how == "perceptron":
        ner = _load_perceptron_ner()
        if ner is not None:
            # vendored averaged-perceptron NER (functions/perceptron.py,
            # trained weights in data/ner_weights.json) — a real
            # statistical model with the reference's 'O' default class
            return ner.tag(list(arr))
    # heuristic fallback: capitalisation with the 'O' default class
    out = []
    for i, t in enumerate(arr):
        out.append("ENTITY" if i > 0 and t[:1].isupper() else "O")
    return out


def _lemma_batch(arr, backend: str | None = None):
    if arr is None:
        return None
    how = _resolve(backend)
    if how == "spacy":
        return [
            t.lemma_ or t.text for t in _spacy_doc(_load_spacy(), arr)
        ]
    if how == "perceptron":
        lem = _load_lemmatizer()
        tagger = _load_perceptron()
        if lem is not None and tagger is not None:
            # POS-conditioned morphy lemmatisation (functions/
            # lemmatizer.py): detachment rules validated against the
            # vendored lexicon, POS from the perceptron tagger — the
            # CoreNLP lemma() contract (tag first, then lemmatise)
            tags = tagger.tag(list(arr))
            return [lem.lemma(t, tag) for t, tag in zip(arr, tags)]
    return [_heuristic_lemma(t) for t in arr]


def make_tag_udf(kernel, backend: str | None = None):
    """Arrow-batched array→array tagging UDF with a pinned backend (None
    → resolve from PUMA_NLP_BACKEND at batch time on the executor)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda arr: kernel(arr, backend))

    return _udf


@F.pandas_udf(ArrayType(StringType()))
def pos_tags(tokens: pd.Series) -> pd.Series:
    """Arrow-batched POS tagging of token arrays (backend-dispatched)."""
    return tokens.map(_pos_batch)


@F.pandas_udf(ArrayType(StringType()))
def ner_tags(tokens: pd.Series) -> pd.Series:
    """Arrow-batched NER tagging (backend-dispatched: spaCy entity types
    when available, else the capitalisation heuristic with the
    reference's 'O' default class)."""
    return tokens.map(_ner_batch)


_VOWELS = set("aeiou")

_IRREGULAR_LEMMAS = {
    "is": "be", "are": "be", "am": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "going": "go",
    "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "people": "person", "data": "datum",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "made": "make", "said": "say", "took": "take", "taken": "take",
    "found": "find", "used": "use", "using": "use", "gave": "give",
    "given": "give", "shown": "show", "showed": "show", "seen": "see",
    "saw": "see",
}


def _heuristic_lemma(tok: str) -> str:
    """Rule-based English lemmatiser — STAND-IN for CoreNLP ``lemma()``
    (Document.sentences().lemmas(), DocumentWordSpecAnalyser.scala:190).
    Irregular table + suffix rules with doubling/e-restore undo;
    deterministic, accuracy-gated in tests against a hand-tagged
    fixture rather than exact-matched (SURVEY §7.4)."""
    t = tok.lower()
    if t in _IRREGULAR_LEMMAS:
        return _IRREGULAR_LEMMAS[t]
    if len(t) > 4 and t.endswith("ies"):
        return t[:-3] + "y"
    if len(t) > 4 and (
        t.endswith("sses") or t.endswith("ches") or t.endswith("shes")
        or t.endswith("xes") or t.endswith("zes")
    ):
        return t[:-2]
    if len(t) > 3 and t.endswith("s") and not t.endswith("ss") and not t.endswith("us"):
        return t[:-1]
    for suffix in ("ing", "ed"):
        if len(t) > len(suffix) + 2 and t.endswith(suffix):
            stem = t[: -len(suffix)]
            if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
                return stem[:-1]  # running → run
            if (
                len(stem) > 2
                and stem[-1] not in _VOWELS
                and stem[-2] in _VOWELS
                and stem[-3] not in _VOWELS
            ):
                return stem + "e"  # making → make, scored → score
            return stem  # reading → read
    return t


@F.pandas_udf(ArrayType(StringType()))
def lemmas(tokens: pd.Series) -> pd.Series:
    """Arrow-batched lemmatisation of token arrays (backend-dispatched)."""
    return tokens.map(_lemma_batch)


def heuristic_pos_sql(col: str) -> str:
    """DuckDB CASE expression mirroring ``_heuristic_pos`` rule-for-rule
    (generated from the same word sets, so the oracle cannot drift)."""
    d = ", ".join(f"'{w}'" for w in sorted(_DETERMINERS))
    p = ", ".join(f"'{w}'" for w in sorted(_PREPOSITIONS))
    m = ", ".join(f"'{w}'" for w in sorted(_MODALS))
    return (
        f"CASE WHEN {col} IN ({d}) THEN 'DT'"
        f" WHEN {col} IN ({p}) THEN 'IN'"
        f" WHEN {col} IN ({m}) THEN 'MD'"
        f" WHEN {col} LIKE '%ing' THEN 'VBG'"
        f" WHEN {col} LIKE '%ed' THEN 'VBD'"
        f" WHEN {col} LIKE '%ly' THEN 'RB'"
        f" WHEN {col} LIKE '%s' AND len({col}) > 3 THEN 'NNS'"
        f" ELSE 'NN' END"
    )


def heuristic_lemma_sql(col: str) -> str:
    """DuckDB CASE expression mirroring ``_heuristic_lemma`` (irregular
    table + suffix rules incl. doubling/e-restore undo), generated from
    the same ``_IRREGULAR_LEMMAS`` dict.  Assumes ``col`` is already
    lowercase (tokenize output)."""
    irr = " ".join(
        f"WHEN {col} = '{k}' THEN '{v}'" for k, v in _IRREGULAR_LEMMAS.items()
    )
    vowels = "('a','e','i','o','u')"

    def stem_rules(stem: str) -> str:
        last = f"substr({stem}, len({stem}), 1)"
        last2 = f"substr({stem}, len({stem})-1, 1)"
        last3 = f"substr({stem}, len({stem})-2, 1)"
        return (
            f"CASE WHEN len({stem}) > 2 AND {last} = {last2}"
            f" AND {last} NOT IN ('l','s','z')"
            f" THEN left({stem}, len({stem})-1)"
            f" WHEN len({stem}) > 2 AND {last} NOT IN {vowels}"
            f" AND {last2} IN {vowels} AND {last3} NOT IN {vowels}"
            f" THEN {stem} || 'e'"
            f" ELSE {stem} END"
        )

    ing = stem_rules(f"left({col}, len({col})-3)")
    ed = stem_rules(f"left({col}, len({col})-2)")
    return (
        f"CASE {irr}"
        f" WHEN len({col}) > 4 AND {col} LIKE '%ies'"
        f" THEN left({col}, len({col})-3) || 'y'"
        f" WHEN len({col}) > 4 AND (right({col}, 4) IN ('sses','ches','shes')"
        f" OR right({col}, 3) IN ('xes','zes'))"
        f" THEN left({col}, len({col})-2)"
        f" WHEN len({col}) > 3 AND {col} LIKE '%s'"
        f" AND right({col}, 2) <> 'ss' AND right({col}, 2) <> 'us'"
        f" THEN left({col}, len({col})-1)"
        f" WHEN len({col}) > 5 AND {col} LIKE '%ing' THEN {ing}"
        f" WHEN len({col}) > 4 AND {col} LIKE '%ed' THEN {ed}"
        f" ELSE {col} END"
    )


def word_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "document_version_id",
    min_lemma_len: int = 4,
    whitelist: tuple[str, ...] = POS_WHITELIST,
    backend: str | None = None,
) -> DataFrame:
    """Per-word NLP feature rows: (doc, word, lemma, pos_tag,
    word_position), POS-whitelisted with lemma length ≥ min_lemma_len —
    the DocumentWordSpecAnalyser.scala:166-220 extraction (one output
    row per kept word, positions 1-based over the full token stream).
    ``backend`` pins the tagger ('heuristic' gives the oracle-
    reproducible rule path); None resolves from the environment.
    """
    from puma_matcher_spark.functions.text import tokenize

    lemma_udf = make_tag_udf(_lemma_batch, backend)
    pos_udf = make_tag_udf(_pos_batch, backend)
    toks = docs.select(
        F.col(id_col).alias("document_version_id"),
        tokenize(F.col(text_col)).alias("_words"),
    )
    tagged = toks.select(
        "document_version_id",
        F.posexplode(
            F.arrays_zip(
                F.col("_words").alias("word"),
                lemma_udf(F.col("_words")).alias("lemma"),
                pos_udf(F.col("_words")).alias("pos_tag"),
            )
        ).alias("pos", "z"),
    )
    wl = F.array(*[F.lit(t) for t in whitelist])
    return (
        tagged.where(
            F.array_contains(wl, F.col("z.pos_tag"))
            & (F.length("z.lemma") >= min_lemma_len)
        )
        .select(
            "document_version_id",
            F.col("z.word").alias("word"),
            F.col("z.lemma").alias("lemma"),
            F.col("z.pos_tag").alias("pos_tag"),
            (F.col("pos") + 1).cast("long").alias("word_position"),
        )
    )


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
