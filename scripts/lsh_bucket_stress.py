#!/usr/bin/env python
"""LSH band-bucket stress: the bucket-size guard on a boilerplate corpus.

Generates a pathological corpus where 5,000 documents share identical
boilerplate text (one LSH bucket per band), plus well-behaved documents.
Without the guard the boilerplate bucket alone implies
5000·4999/2 ≈ 12.5M candidate pairs per band (quadratic in cluster
size — the 100 TB failure mode for cookie banners / licence headers);
with the guard the bucket is dropped and pair count stays linear.

Run: python scripts/lsh_bucket_stress.py  (~1 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from puma_matcher_spark.llmdata import dedup as dd
from puma_matcher_spark.session import get_spark


def main() -> None:
    spark = get_spark("lsh-bucket-stress")
    spark.sparkContext.setLogLevel("ERROR")

    n_boiler = 5_000
    n_normal = 2_000
    boiler = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "this site uses cookies to improve your experience accept all "
            "cookies or manage preferences in settings privacy policy terms"
        ).alias("text"),
    )
    # fully distinct docs: every token is id-suffixed, so no two normal
    # docs share a shingle (isolates the boilerplate cluster's effect)
    normal = spark.range(n_normal).select(
        (F.col("id") + n_boiler).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}x"), F.col("id").cast("string"))
                for i in range(8)
            ],
        ).alias("text"),
    )
    docs = boiler.unionByName(normal)

    bands = dd.lsh_band_keys(dd.minhash_signatures(dd.shingles(docs)))
    bands.persist().count()

    t0 = time.time()
    unguarded = dd.lsh_candidate_pairs(bands, max_bucket_size=None).count()
    t_unguarded = time.time() - t0

    t0 = time.time()
    guarded = dd.lsh_candidate_pairs(bands, max_bucket_size=2000).count()
    t_guarded = time.time() - t0

    quadratic = n_boiler * (n_boiler - 1) // 2
    print(f"boilerplate cluster size: {n_boiler} (implies {quadratic:,} pairs)")
    print(f"unguarded pairs: {unguarded:,}  in {t_unguarded:.1f}s")
    print(f"guarded pairs:   {guarded:,}  in {t_guarded:.1f}s")
    print(f"reduction: {unguarded / max(guarded, 1):,.0f}x")
    assert unguarded >= quadratic
    assert guarded < n_boiler  # boilerplate bucket fully dropped


if __name__ == "__main__":
    main()
