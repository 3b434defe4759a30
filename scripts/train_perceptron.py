"""Train the vendored averaged-perceptron POS tagger and write its
weights file (puma_matcher_spark/functions/data/perceptron_weights.json).

Deterministic: fixed epoch count, fixed modular visit order, no RNG —
rerunning reproduces the shipped weights byte-for-byte, so the weights
file is reviewable as a build artifact of data/pos_train.txt.

Usage:  python scripts/train_perceptron.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.functions.perceptron import (
    WEIGHTS_PATH,
    read_tagged_corpus,
    train,
)


def main() -> None:
    sentences = read_tagged_corpus()
    n_tokens = sum(len(s) for s in sentences)
    tagger = train(sentences, n_iter=8)
    tagger.save(WEIGHTS_PATH)
    # self-check: training-set tagging accuracy (greedy, with tagdict)
    hits = total = 0
    for sent in sentences:
        tags = tagger.tag([w for w, _ in sent])
        for (_, gold), got in zip(sent, tags):
            hits += gold == got
            total += 1
    size = os.path.getsize(WEIGHTS_PATH)
    print(
        f"trained on {len(sentences)} sentences / {n_tokens} tokens; "
        f"train-set accuracy {hits / total:.3f}; "
        f"weights {size / 1024:.0f} KiB -> {WEIGHTS_PATH}"
    )


if __name__ == "__main__":
    main()
