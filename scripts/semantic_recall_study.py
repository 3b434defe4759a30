#!/usr/bin/env python
"""Semantic-contamination recall on PLANTED paraphrase leaks (round-9
verdict #3): the scan's df_cap/min_shared blocking is heuristic recall,
and until now the caveat was documented but unquantified.  This measures
it the way round 8 measured ANN recall — planted ground truth, recall
against the UNBLOCKED all-pairs scan (the export's oracle definition) at
the same cosine threshold, across the blocking parameter grid.

Leak families planted into a 4,300-doc corpus against a 50-doc benchmark:

* exact      — byte-identical copies (sanity: recall must be 1);
* para-block — keep the first ceil(40*f) benchmark tokens, replace the
  tail with fresh tokens, f in {0.9, 0.75, 0.6, 0.45} (a contiguous
  shared run: the friendliest paraphrase for shingle blocking);
* para-scat  — replace round(40*(1-f)) EVENLY SPACED tokens (the
  adversarial pattern: each replacement kills up to n shingles);
* boiler     — benchmark and leak are both pure cyclic boilerplate whose
  every shingle has document frequency >> df_cap (the designed
  blindspot: common-content similarity has no rare shingles to block on).

For every (min_shared, df_cap) in {1,2} x {64,128} and every threshold in
{0.8, 0.65, 0.5}: recall = |blocked-scan hits ∩ truth| / |truth| overall
and per family, plus the blocked candidate-pair volume (threshold -1).

Run: python scripts/semantic_recall_study.py   (~3 min)
Prints one JSON line; recorded in PLANS.md (round-9 semantic recall).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from puma_matcher_spark.llmdata import similarity as sim
from puma_matcher_spark.session import get_spark

L = 40          # tokens per doc
N_UNIQUE = 4000
N_BOILER = 300
POOL = 30       # boilerplate cyclic vocabulary
PER_FAMILY = 5


def _tok_doc(prefix: str, i: int) -> list[str]:
    return [f"{prefix}{i}_{j}" for j in range(L)]


def _boiler_doc(offset: int) -> list[str]:
    return [f"bp{(offset + j) % POOL}" for j in range(L)]


def build(spark):
    """(corpus_df, benchmark_df, planted: {(corpus_id, benchmark_id): family})."""
    corpus_rows = [(i, " ".join(_tok_doc("u", i))) for i in range(N_UNIQUE)]
    corpus_rows += [
        (N_UNIQUE + i, " ".join(_boiler_doc(i))) for i in range(N_BOILER)
    ]
    bench_rows, planted = [], {}
    leak_id = 10**6
    bid = 0

    def plant(bench_tokens, leak_tokens, family):
        nonlocal bid, leak_id
        bench_rows.append((5 * 10**6 + bid, " ".join(bench_tokens)))
        corpus_rows.append((leak_id, " ".join(leak_tokens)))
        planted[(leak_id, 5 * 10**6 + bid)] = family
        bid += 1
        leak_id += 1

    for k in range(PER_FAMILY):
        t = _tok_doc("q", bid)
        plant(t, list(t), "exact")
    for f in (0.9, 0.75, 0.6, 0.45):
        for k in range(PER_FAMILY):
            t = _tok_doc("q", bid)
            keep = int(round(L * f))
            leak = list(t[:keep]) + [f"x{bid}_{j}" for j in range(L - keep)]
            plant(t, leak, f"para-block-{f}")
    for f in (0.9, 0.75, 0.6, 0.45):
        for k in range(PER_FAMILY):
            t = _tok_doc("q", bid)
            r = int(round(L * (1 - f)))
            repl = {int(j * L / r) for j in range(r)}
            leak = [
                (f"x{bid}_{j}" if j in repl else t[j]) for j in range(L)
            ]
            plant(t, leak, f"para-scat-{f}")
    for k in range(PER_FAMILY):
        plant(_boiler_doc(7 * k), _boiler_doc(7 * k), "boiler")

    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    return corpus.repartition(16).cache(), bench.cache(), planted


def truth_pairs(corpus, bench, threshold: float) -> set:
    """Unblocked all-pairs cross cosine — the oracle definition."""
    cv = sim.shingle_hash_embeddings(corpus).select(
        F.col("doc_id").alias("corpus_id"),
        F.col("embedding").alias("_ce"),
        sim.norm(F.col("embedding")).alias("_cn"),
    )
    bv = sim.shingle_hash_embeddings(bench).select(
        F.col("doc_id").alias("benchmark_id"),
        F.col("embedding").alias("_be"),
        sim.norm(F.col("embedding")).alias("_bn"),
    )
    pairs = (
        cv.where(F.col("_cn") > 0)
        .crossJoin(F.broadcast(bv.where(F.col("_bn") > 0)))
        .where(
            sim.dot(F.col("_ce"), F.col("_be"))
            / (F.col("_cn") * F.col("_bn"))
            >= threshold
        )
        .select("corpus_id", "benchmark_id")
    )
    return {(r["corpus_id"], r["benchmark_id"]) for r in pairs.collect()}


def main() -> None:
    spark = get_spark("semantic-recall-study")
    spark.sparkContext.setLogLevel("ERROR")
    corpus, bench, planted = build(spark)
    out = {"n_corpus": corpus.count(), "n_bench": bench.count(), "grid": []}
    truths = {t: truth_pairs(corpus, bench, t) for t in (0.8, 0.65, 0.5)}
    for t, tp in truths.items():
        fams = {}
        for pair, fam in planted.items():
            fams.setdefault(fam, [0, 0])
            fams[fam][1] += 1
            if pair in tp:
                fams[fam][0] += 1
        out[f"truth@{t}"] = {
            "n_pairs": len(tp),
            "planted_in_truth": {
                k: f"{v[0]}/{v[1]}" for k, v in sorted(fams.items())
            },
        }
    for min_shared in (1, 2):
        for df_cap in (64, 128):
            n_cands = sim.semantic_contamination(
                corpus, bench, threshold=-1.0,
                df_cap=df_cap, min_shared=min_shared,
            ).count()
            row = {
                "min_shared": min_shared,
                "df_cap": df_cap,
                "candidates": n_cands,
            }
            for t, tp in truths.items():
                got = sim.semantic_contamination(
                    corpus, bench, threshold=t,
                    df_cap=df_cap, min_shared=min_shared,
                )
                hits = {
                    (r["corpus_id"], r["benchmark_id"])
                    for r in got.collect()
                }
                caught = hits & tp
                by_fam = {}
                for pair, fam in planted.items():
                    if pair not in tp:
                        continue
                    by_fam.setdefault(fam, [0, 0])
                    by_fam[fam][1] += 1
                    if pair in caught:
                        by_fam[fam][0] += 1
                row[f"recall@{t}"] = (
                    round(len(caught) / len(tp), 4) if tp else None
                )
                row[f"by_family@{t}"] = {
                    k: f"{v[0]}/{v[1]}" for k, v in sorted(by_fam.items())
                }
            out["grid"].append(row)
            print(json.dumps(row), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
