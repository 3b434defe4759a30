#!/usr/bin/env python
"""Demonstrate the incremental-ingest scale shape: admitting a small
batch against a corpus must cost ~O(|batch|) LSH work, not re-pay the
corpus self-join.

Compares, at the given sf dir:

* full-corpus near-dup candidate generation (minhash_dedup_pairs over
  everything — what a naive daily rerun would pay), vs
* incremental candidates (minhash_incremental_pairs: batch × corpus).

Run: python scripts/ingest_stress.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from puma_matcher_spark.llmdata import dedup as dd  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402
from puma_matcher_spark.sources.testdata import load_tables  # noqa: E402


def timed(label: str, fn) -> None:
    fn()  # warm
    best = min(
        (lambda t0=time.monotonic(): (fn(), time.monotonic() - t0)[1])()
        for _ in range(2)
    )
    print(f"RESULT>> {label}: {best:.3f}s")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ingest-stress")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_tables(spark, sf_dir).llm_documents()
    batch = base.where(F.col("doc_id") % 50 == 0)      # small daily batch
    # scale the corpus 10× (id-offset copies with salted text so the
    # copies don't collapse into identical shingle sets) — the point is
    # the |batch| ≪ |corpus| asymmetry a real ingest has
    corpus = None
    for i in range(10):
        c = base.where(F.col("doc_id") % 50 != 0).select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit(f"copy{i}")).alias("text"),
            "lang",
            "source",
        )
        corpus = c if corpus is None else corpus.unionByName(c)
    docs = corpus.unionByName(batch.select("doc_id", "text", "lang", "source"))
    n_b, n_c = batch.count(), corpus.count()
    print(f"RESULT>> batch={n_b} corpus={n_c}")

    timed(
        "full corpus self-candidates (naive rerun)",
        lambda: dd.minhash_dedup_pairs(docs).count(),
    )
    timed(
        "incremental, corpus index recomputed inline",
        lambda: dd.minhash_incremental_pairs(batch, corpus).count(),
    )

    # the production shape: corpus band keys are a PRECOMPUTED index
    # (built once at corpus-publish time, reused by every batch) — the
    # per-batch cost is then the batch-side map work plus one index join
    from pyspark.sql.window import Window

    corpus_index = dd.lsh_band_keys(
        dd.minhash_signatures(dd.shingles(corpus))
    ).persist()
    corpus_index.count()  # materialise the index
    bucket_w = Window.partitionBy("band", "band_key")
    capped = (
        corpus_index.withColumn("_n", F.count(F.lit(1)).over(bucket_w))
        .where(F.col("_n") <= dd.DEFAULT_MAX_BUCKET)
        .drop("_n")
    )

    def batch_against_index() -> None:
        nb = dd.lsh_band_keys(dd.minhash_signatures(dd.shingles(batch)))
        (
            nb.select("band", "band_key", F.col("doc_id").alias("new_doc_id"))
            .join(
                capped.select(
                    "band", "band_key", F.col("doc_id").alias("corpus_doc_id")
                ),
                ["band", "band_key"],
            )
            .select("new_doc_id", "corpus_doc_id")
            .distinct()
            .count()
        )

    timed("incremental, corpus index precomputed", batch_against_index)


if __name__ == "__main__":
    main()
