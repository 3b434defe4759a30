"""Pre-flight for the driver's CORRECTNESS gate: run the SAME comparison the
driver runs (first 50 queries of the ordered registry, sf0.01 DuckDB oracle,
rows + schema + order-insensitive values) so any mismatch is caught locally
before round submission.

Usage:  python scripts/driver_gate_check.py [sf_dir] [window]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.oracle import compare_query, duck_connection
from puma_matcher_spark.queries import _ordered
from puma_matcher_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("driver-gate-check")
    con = duck_connection(sf_dir)
    ordered = list(_ordered().items())[:window]
    n_fail = 0
    for name, spec in ordered:
        t0 = time.time()
        if spec.oracle is None:
            try:
                rows = spec.spark_fn(spark, sf_dir).count()
                print(f"[rows-only] {name}: {rows} rows  ({time.time()-t0:.1f}s)")
            except Exception as e:
                n_fail += 1
                print(f"[FAIL] {name}: EXC {type(e).__name__}: {e}")
            continue
        try:
            res = compare_query(spark, con, name, spec.spark_fn, spec.oracle, sf_dir)
        except Exception as e:
            n_fail += 1
            print(f"[FAIL] {name}: EXC {type(e).__name__}: {e}")
            continue
        if not res.ok:
            n_fail += 1
        print(f"{res}  ({time.time()-t0:.1f}s)")
    print(f"\n{window - n_fail}/{window} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
