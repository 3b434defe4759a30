"""Train the vendored averaged-perceptron POS tagger and NER model and
write their weights files (puma_matcher_spark/functions/data/
perceptron_weights.json + ner_weights.json).

Deterministic: fixed epoch count, fixed modular visit order, no RNG —
rerunning reproduces the shipped weights byte-for-byte, so each weights
file is reviewable as a build artifact of its corpus
(data/pos_train.txt / data/ner_train.txt).

Usage:  python scripts/train_perceptron.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.functions.perceptron import (
    NER_TRAIN_PATH,
    NER_WEIGHTS_PATH,
    TRAIN_PATH,
    WEIGHTS_PATH,
    read_tagged_corpus,
    train,
)


def _train_one(
    corpus_path: str, weights_path: str, features: str, default: str
) -> None:
    sentences = read_tagged_corpus(corpus_path)
    n_tokens = sum(len(s) for s in sentences)
    tagger = train(sentences, n_iter=8, features=features, default=default)
    tagger.save(weights_path)
    # self-check: training-set tagging accuracy (greedy, with tagdict)
    hits = total = 0
    for sent in sentences:
        tags = tagger.tag([w for w, _ in sent])
        for (_, gold), got in zip(sent, tags):
            hits += gold == got
            total += 1
    size = os.path.getsize(weights_path)
    print(
        f"[{features}] trained on {len(sentences)} sentences / {n_tokens} "
        f"tokens; train-set accuracy {hits / total:.3f}; "
        f"weights {size / 1024:.0f} KiB -> {weights_path}"
    )


def main() -> None:
    _train_one(TRAIN_PATH, WEIGHTS_PATH, "pos", "NN")
    _train_one(NER_TRAIN_PATH, NER_WEIGHTS_PATH, "ner", "O")


if __name__ == "__main__":
    main()
