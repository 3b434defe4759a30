#!/usr/bin/env python
"""As-of join scale evidence: union-and-window vs naive range join.

The naive formulation joins every left row to EVERY earlier right row of
the same key and then argmin-dedups — candidate rows scale with
|left| x |right-per-key|, so a hot key goes quadratic.  The
union-and-window formulation (operators/asof.py) carries the last right
row forward in one sort: linear rows, one shuffle.

Run: python scripts/asof_stress.py [n_keys] [rows_per_key]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from puma_matcher_spark.operators.asof import asof_join  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_key = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("asof-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n_keys * per_key).select(
        (F.col("id") % n_keys).alias("user_id"),
        F.col("id").alias("ts"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    # alternate rows WITHIN each key between the two sides (splitting on
    # raw ts parity correlates with user_id = id % n_keys and starves
    # half the keys of right rows entirely)
    seq = (F.col("ts") / n_keys).cast("long")
    left = base.where(seq % 2 == 0)
    right = base.where(seq % 2 == 1)

    def naive():
        cand = left.alias("l").join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts")),
        )
        w = Window.partitionBy("l.user_id", "l.ts").orderBy(F.col("r.ts").desc())
        return (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col("l.user_id"), F.col("l.ts"), F.col("r.v").alias("asof_v")
            )
        )

    def windowed():
        return asof_join(left, right, on="user_id", ts="ts").select(
            "user_id", "ts", "asof_v"
        )

    for name, fn in [("naive-range-join", naive), ("union-window", windowed)]:
        fn().count()  # warm
        t = time.monotonic()
        n = fn().count()
        print(f"{name:>17}: {time.monotonic() - t:6.2f}s  rows={n}")

    # equivalence spot check on the non-null matches
    a = {tuple(r) for r in windowed().where(F.col("asof_v").isNotNull()).collect()}
    b = {tuple(r) for r in naive().collect()}
    print("identical results:", a == b)


if __name__ == "__main__":
    main()
