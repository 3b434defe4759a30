#!/usr/bin/env python
"""r12 drain-granularity study (r11 verdict #6, SIDECAR-ONLY — the
benched streaming workload stays an uncapped availableNow drain).

The benched 120-doc ingest drains as ONE monolithic micro-batch
(n_batches=1), so the 8-vs-32-core scaling row for streaming carries no
signal and per-batch admission cost is invisible.  This script runs the
SAME workload at several `max_rows_per_trigger` caps and records the
total drain wall time + per-batch durations, producing the trigger-size
curve the verdict asked for.

Capped runs use a tight processingTime trigger (Spark's Python
micro-batch wrapper does not support availableNow — it falls back to
single-batch execution, which would strand the backlog after one capped
batch); the driver polls the committed offset and stops the query once
the full manifest is consumed.

Usage: python scripts/streaming_trigger_study.py [n_docs] [caps,...]
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


def build_workload(root: str, n_docs: int):
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    lines = ["doc_id,file_path"]
    for i in range(n_docs):
        p = os.path.join(src, f"d{i}.txt")
        with open(p, "w", encoding="utf-8") as fh:
            fh.write(" ".join(f"t{i}x{j}" for j in range(30)))
        lines.append(f"{i},{p}")
    manifest = os.path.join(root, "manifest.csv")
    with open(manifest, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    return manifest


def committed_rows(q) -> int:
    prog = q.lastProgress
    if not prog or not prog.get("sources"):
        return 0
    off = prog["sources"][0].get("endOffset")
    if not off:
        return 0
    # the Python simple stream reader reports its offset dict as a
    # PYTHON-repr string ("{'rows': 8}"), not JSON — literal_eval it
    import ast

    try:
        if isinstance(off, str):
            off = ast.literal_eval(off)
        return int(off.get("rows", 0))
    except Exception:
        return 0


def run_once(spark, manifest, corpus, root, tag: str, cap: int | None, n_docs: int):
    out = os.path.join(root, f"out_{tag}")
    ckpt = os.path.join(root, f"ckpt_{tag}")
    start = time.monotonic()
    q = run_streaming_ingest_app(
        spark, manifest, corpus, out, ckpt, max_rows_per_trigger=cap or None
    )
    if cap:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            if committed_rows(q) >= n_docs:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
    else:
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("uncapped drain did not finish")
    elapsed = round(time.monotonic() - start, 3)
    n = spark.read.parquet(out).count()
    assert n == n_docs, f"{tag}: admitted {n}/{n_docs}"
    progress = q.recentProgress or []
    batch_secs = [round(p["batchDuration"] / 1000.0, 3) for p in progress if p.get("numInputRows", 0) > 0]
    return {
        "cap": cap or 0,
        "total_wall": elapsed,
        "n_batches": len(batch_secs),
        "drain": round(sum(batch_secs), 3),
        "batch_secs": batch_secs,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    caps = (
        [int(c) for c in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0, 60, 30, 15]
    )
    spark = get_spark("streaming-trigger-study")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="trigger_study_")
    try:
        manifest = build_workload(root, n_docs)
        corpus = spark.createDataFrame(
            [
                (10_000 + i, f"corpus document c{i}a c{i}b c{i}c c{i}d")
                for i in range(10)
            ],
            ["doc_id", "text"],
        )
        results = []
        # one throwaway warm run (JIT/codegen) so cap comparisons are
        # warm-vs-warm like the bench headline
        run_once(spark, manifest, corpus, root, "warm", None, n_docs)
        for rep in range(2):
            for cap in caps:
                r = run_once(
                    spark, manifest, corpus, root, f"c{cap}_r{rep}", cap, n_docs
                )
                results.append(r)
                print("RESULT>>", json.dumps(r))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
