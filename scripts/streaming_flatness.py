#!/usr/bin/env python
"""Round-8 proof for the streaming ingest's per-batch cost (VERDICT r7
#3): drive N manifest appends of M docs each through
run_streaming_ingest_app (one availableNow drain per append) and record
per-append wall time.  With the round-7 full-text re-read, per-append
time grew with the admitted corpus (cumulatively quadratic over a long
manifest tail); with the round-8 DedupIndex pattern (per-batch
fingerprint/band-key/shingle parquet, unioned as hash-width rows) it
must stay FLAT.

Usage: python scripts/streaming_flatness.py [n_appends] [docs_per_append]
Prints one JSON line: {"appends": [...sec], "rows_per_sec": N, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.apps import run_streaming_ingest_app  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    spark = get_spark("streaming-flatness")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_flat_")
    try:
        src = os.path.join(root, "incoming")
        os.makedirs(src)
        manifest = os.path.join(root, "manifest.csv")
        with open(manifest, "w", encoding="utf-8") as fh:
            fh.write("doc_id,file_path\n")
        corpus = spark.createDataFrame(
            [(10**6 + i, f"corpus document c{i}a c{i}b c{i}c c{i}d") for i in range(10)],
            ["doc_id", "text"],
        )
        out = os.path.join(root, "admitted")
        ckpt = os.path.join(root, "ckpt")
        times = []
        for a in range(n_appends):
            lines = []
            for i in range(n_docs):
                did = a * n_docs + i
                p = os.path.join(src, f"d{did}.txt")
                with open(p, "w", encoding="utf-8") as fh:
                    fh.write(" ".join(f"a{a}d{did}w{j}" for j in range(30)))
                lines.append(f"{did},{p}")
            with open(manifest, "a", encoding="utf-8") as fh:
                fh.write("\n".join(lines) + "\n")
            start = time.monotonic()
            q = run_streaming_ingest_app(spark, manifest, corpus, out, ckpt)
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError(f"append {a} did not drain in 600s")
            times.append(round(time.monotonic() - start, 3))
            print(f"append {a}: {times[-1]} s", file=sys.stderr)
        n = spark.read.parquet(out).count()
        assert n == n_appends * n_docs, f"admitted {n}/{n_appends * n_docs}"
        total = sum(times)
        first3 = sum(times[:3]) / 3
        last3 = sum(times[-3:]) / 3
        print(
            json.dumps(
                {
                    "appends": times,
                    "n_appends": n_appends,
                    "docs_per_append": n_docs,
                    "rows_per_sec": round(n / total, 1),
                    "first3_avg": round(first3, 3),
                    "last3_avg": round(last3, 3),
                    "growth_ratio": round(last3 / first3, 3),
                },
                separators=(",", ":"),
            )
        )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
