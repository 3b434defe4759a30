#!/usr/bin/env python
"""Z-order layout scale evidence: parquet row-group skipping on TWO
columns from ONE layout.

A table sorted linearly by column `a` skips well on `a`-predicates but
its `b` min/max envelopes span the whole domain, so `b`-predicates scan
everything.  The Morton layout (sources/maintenance.py zorder_by)
interleaves both columns' bits into one sort key: every file's envelope
is tight on BOTH columns, so either predicate (or a box on both) prunes.

The script writes lineitem three ways (unsorted, linear sort on
l_partkey, z-order on l_partkey+l_suppkey), runs the same box predicate
on each, and reports rows actually read out of the parquet scan
(numOutputRows of the scan node before the post-scan filter would hide
skipping — we read the metric that counts rows surviving row-group
pruning + predicate pushdown).

Run: python scripts/zorder_stress.py [sf_dir] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from puma_matcher_spark.session import get_spark  # noqa: E402
from puma_matcher_spark.sources.maintenance import (  # noqa: E402
    zorder_by,
    zorder_by_quantized,
)


def scan_rows_read(spark, path, pred):
    """Rows emerging from the parquet scan (after row-group pruning and
    pushed filters) for `pred`, via the executed plan's scan metrics."""
    df = spark.read.parquet(path).where(pred)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # first leaf is the scan; its metrics include numOutputRows
    leaves = plan.collectLeaves()
    scan = leaves.apply(0)
    return scan.metrics().apply("numOutputRows").value()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("zorder-stress")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    total = li.count()
    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_max = li.agg(F.max("l_suppkey")).collect()[0][0]
    # ~10% ranges — INTEGER literals so the comparison pushes down to the
    # parquet reader (a float literal would wrap the column in a cast and
    # disable row-group stat pruning)
    pk_pred = F.col("l_partkey") < int(pk_max * 0.1)
    sk_pred = F.col("l_suppkey") < int(sk_max * 0.1)
    preds = {
        "partkey<10%": pk_pred,
        "suppkey<10%": sk_pred,
        "box both<10%": pk_pred & sk_pred,
    }

    work = tempfile.mkdtemp(prefix="zorder-stress-")
    try:
        layouts = {
            "unsorted": li.repartition(n_files),
            "linear_partkey": li.repartitionByRange(n_files, "l_partkey")
            .sortWithinPartitions("l_partkey"),
            "zorder_raw": zorder_by(li, "l_partkey", "l_suppkey", n_ranges=n_files),
            "zorder_quant": zorder_by_quantized(
                li, "l_partkey", "l_suppkey", n_ranges=n_files
            ),
        }
        print(f"rows total: {total}; % = share of table read from the scan")
        print(f"{'layout':16s} " + " ".join(f"{p:>14s}" for p in preds))
        for name, df in layouts.items():
            path = os.path.join(work, name)
            df.write.mode("overwrite").parquet(path)
            cells = []
            for pred in preds.values():
                read = scan_rows_read(spark, path, pred)
                cells.append(f"{100.0 * read / total:13.1f}%")
            print(f"{name:16s} " + " ".join(cells))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
