#!/usr/bin/env python
"""Dump ``explain("formatted")`` for the named queries to files.

Usage:
    python scripts/capture_plans.py OUT_DIR SUFFIX [SF_DIR] name [name ...]

Writes ``OUT_DIR/<name>_<SUFFIX>.txt`` per query — the evidence files the
optimization rounds commit under plans/r{N}/ so plan-shape claims
(Exchange counts, join strategies, scan counts) are checkable without a
Spark runtime.  Queries whose builders run eager pre-flight jobs (the
graph loops, the envelope guards) execute those at the capture sf, so
prefer sf0.001 for cheap captures; the plan SHAPE is sf-independent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.plans.inspect import formatted_plan  # noqa: E402
from puma_matcher_spark.queries import REGISTRY  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"-- query: {name}  sf_dir: {sf_dir}  suffix: {suffix}\n")
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"WROTE>> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
