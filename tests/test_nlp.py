"""NLP plane (M7): lemma/POS heuristics accuracy-gated on a hand-tagged
fixture (SURVEY §7.4 — tagger divergence from CoreNLP is expected; gate
with labelled metrics, not exact match), plus the word-feature
extraction shape of DocumentWordSpecAnalyser.scala:166-220."""

from pyspark.sql import functions as F

from puma_matcher_spark.functions.nlp import (
    POS_WHITELIST,
    _heuristic_lemma,
    _heuristic_pos,
    word_features,
)

# hand-tagged fixture: (token, gold_coarse_pos, gold_lemma)
FIXTURE = [
    ("the", "DT", "the"),
    ("neutron", "NN", "neutron"),
    ("beams", "NNS", "beam"),
    ("were", "VB", "be"),
    ("scattering", "VBG", "scatter"),
    ("slowly", "RB", "slowly"),
    ("in", "IN", "in"),
    ("a", "DT", "a"),
    ("chamber", "NN", "chamber"),
    ("that", "DT", "that"),
    ("contained", "VBD", "contain"),
    ("samples", "NNS", "sample"),
    ("of", "IN", "of"),
    ("materials", "NNS", "material"),
    ("studied", "VBD", "study"),
    ("with", "IN", "with"),
    ("detectors", "NNS", "detector"),
    ("running", "VBG", "run"),
    ("experiments", "NNS", "experiment"),
    ("measured", "VBD", "measure"),
    ("values", "NNS", "value"),
    ("for", "IN", "for"),
    ("energies", "NNS", "energy"),
    ("making", "VBG", "make"),
    ("must", "MD", "must"),
    ("analyses", "NNS", "analyse"),
    ("reported", "VBD", "report"),
    ("results", "NNS", "result"),
    ("from", "IN", "from"),
    ("instrument", "NN", "instrument"),
]


def _coarse(tag: str) -> str:
    for prefix in ("NNS", "NN", "VBG", "VBD", "VB", "DT", "IN", "MD", "RB"):
        if tag.startswith(prefix):
            return prefix
    return tag


def test_pos_accuracy_on_hand_tagged_fixture():
    hits = sum(
        1 for tok, gold, _ in FIXTURE if _coarse(_heuristic_pos(tok)) == gold
    )
    acc = hits / len(FIXTURE)
    assert acc >= 0.85, f"POS accuracy {acc:.2f} below gate"


def test_lemma_accuracy_on_hand_tagged_fixture():
    hits = sum(1 for tok, _, gold in FIXTURE if _heuristic_lemma(tok) == gold)
    acc = hits / len(FIXTURE)
    assert acc >= 0.9, f"lemma accuracy {acc:.2f} below gate"


def test_word_features_whitelist_and_positions(spark):
    docs = spark.createDataFrame(
        [(1, "The detectors were running experiments slowly")],
        ["document_version_id", "text"],
    )
    rows = {
        r["word"]: (r["lemma"], r["pos_tag"], r["word_position"])
        for r in word_features(docs, min_lemma_len=4).collect()
    }
    # 'slowly' is RB (not whitelisted); 'the'/'were' dropped by tokenize
    # or whitelist; 'running' lemmatises to 'run' (3 chars) and is dropped
    # by the reference's lemma-length ≥ 4 filter
    assert "slowly" not in rows
    assert "running" not in rows
    assert rows["detectors"][0] == "detector"
    assert rows["experiments"][0] == "experiment"
    assert all(tag in POS_WHITELIST for _, tag, _ in rows.values())
    # positions are 1-based over the filtered token stream
    assert min(p for _, _, p in rows.values()) >= 1
