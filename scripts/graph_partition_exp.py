#!/usr/bin/env python
"""r12 experiment: right-size the graph-loop shuffle partitions.

The r11 driver scaling block showed pagerank_top runs 40% FASTER on 8
cores than 32 at sf0.1 (ratio 0.60) — pure scheduling overhead from
32-way shuffles over a tiny graph.  This script interleaves variants on
the SAME session/box (A/B methodology from r10/r11) so host drift can't
fake a result:

  A  = HEAD (shuffle.partitions = cpus, parallelismFirst default)
  B+ = candidate settings scoped to the loop (the production fix will
       live inside graph.py; here the conf is flipped around the call)

Usage: python scripts/graph_partition_exp.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.queries import REGISTRY  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, name: str) -> float:
    fn = REGISTRY[name].spark_fn
    start = time.monotonic()
    fn(spark, SF).count()
    return round(time.monotonic() - start, 3)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("graph-partition-exp")
    spark.sparkContext.setLogLevel("ERROR")

    variants: dict[str, dict[str, str]] = {
        "head": {},
        "pf_false": {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        },
        "shuffle4": {"spark.sql.shuffle.partitions": "4"},
        "shuffle4_pf": {
            "spark.sql.shuffle.partitions": "4",
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        },
    }
    defaults = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        ),
    }

    for q in ("pagerank_top", "purchase_communities"):
        # warm: builds the memoized edge cache so every variant measures
        # the LOOP, not the edge derivation
        timed(spark, q)
        results: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(n_pairs):
            for vname, conf in variants.items():
                for k, v in {**defaults, **conf}.items():
                    spark.conf.set(k, v)
                results[vname].append(timed(spark, q))
        for k, v in defaults.items():
            spark.conf.set(k, v)
        print(f"== {q} ==")
        for vname, runs in results.items():
            srt = sorted(runs)
            med = srt[len(srt) // 2]
            print(f"  {vname:12s} min={min(runs):.3f} med={med:.3f} {runs}")


if __name__ == "__main__":
    main()
