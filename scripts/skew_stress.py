#!/usr/bin/env python
"""Skew-stress demonstration: the frequency guard's effect on the entity
self-join at adversarial scale.

Generates a synthetic affiliation table with one pathological hot entity
(100k docs) among well-behaved ones, then times pair generation with and
without the guard.  Without the guard the hot key alone implies ~5e9
pairs (the 100 TB failure mode); with it, work stays linear.

Run: python scripts/skew_stress.py  (~1-2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from puma_matcher_spark.operators import matcher as m
from puma_matcher_spark.session import get_spark


def main() -> None:
    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = 200_000
    hot_docs = 100_000
    docs = spark.range(n_docs).select(F.col("id").alias("document_version_id"))
    normal = docs.select(
        "document_version_id",
        (F.col("document_version_id") % 20_000 + 1000).alias("entity_id"),
    )
    hot = docs.where(F.col("document_version_id") < hot_docs).select(
        "document_version_id", F.lit(1).alias("entity_id")
    )
    ents = normal.unionByName(hot)
    tf = m.entity_tf(ents).persist()
    tf.count()

    t0 = time.monotonic()
    capped = m.cap_entity_frequency(tf, max_occurrence=2000, relative_cap_docs=n_docs)
    n_pairs = m.entity_pairs(capped).count()
    guarded = time.monotonic() - t0
    excluded = m.excluded_entities(tf, 2000).count()
    print(
        f"guarded:   {n_pairs:,} pairs in {guarded:.1f}s "
        f"({excluded} hot entities excluded)"
    )

    # unguarded upper bound, computed not executed: sum df*(df-1)/2
    implied = (
        m.entity_doc_frequency(tf)
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .first()["p"]
    )
    print(f"unguarded: {int(implied):,} pairs implied (not executed)")
    print(f"guard reduction: {int(implied) / max(n_pairs, 1):,.0f}x")


if __name__ == "__main__":
    main()
