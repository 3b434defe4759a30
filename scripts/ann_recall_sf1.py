#!/usr/bin/env python
"""ANN recall at 10x corpus (VERDICT r6 #5): the int8 / prefix-rerank /
IVF recall gates run at sf0.001-0.01 in pytest; IVF probe recall is the
quantity most likely to drift as the corpus grows, so this measures
recall@10 against exact brute force on the 20k-vector sf1 embedding twin
(scripts/gen_sf1.py), sweeping n_probe at two cell counts (the fixture
config 8 and the sqrt-n production sizing 32).

Run: python scripts/gen_sf1.py && python scripts/ann_recall_sf1.py
Results recorded in PLANS.md §round-7 ANN recall at 10x.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from puma_matcher_spark.llmdata import similarity as sim
from puma_matcher_spark.session import get_spark

SF1 = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data-sf1", "embeddings.parquet"
)


def _topk_sets(df, id_col="neighbor_id"):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r[id_col])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for qid, want in exact.items():
        got = approx.get(qid, set())
        hits += len(got & want)
        total += len(want)
    return hits / total if total else 1.0


SF1_CLUSTERED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data-sf1",
    "embeddings_clustered.parquet",
)


def main() -> None:
    if not os.path.exists(SF1):
        raise SystemExit("run scripts/gen_sf1.py first")
    spark = get_spark("ann-recall-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    # both geometries (VERDICT r7 #5): isotropic = the recall floor
    # (IVF recall ~ probe fraction by construction); clustered = the
    # production claim, where cells align with real density and every
    # path should do better
    for path, tag in ((SF1, "isotropic"), (SF1_CLUSTERED, "clustered")):
        if not os.path.exists(path):
            print(f"== {tag}: {path} missing (re-run gen_sf1.py) ==")
            continue
        print(f"== geometry: {tag} ==")
        run_suite(spark, path)


def run_suite(spark, path: str) -> None:
    emb = spark.read.parquet(path).persist()
    n = emb.count()
    q = emb.where(F.col("vec_id") % 500 == 0)
    nq = q.count()
    print(f"corpus {n} vectors, {nq} queries, k=10")
    exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))

    r = _recall(_topk_sets(sim.int8_topk(emb, q, k=10)), exact)
    print(f"int8_topk               recall@10 = {r:.3f}  (pytest gate 0.9)")
    # shortlist must scale with the corpus: sweep the absolute size so
    # the recall/shortlist-fraction rule is documented, not assumed
    for shortlist in (100, 300, 1000):
        r = _recall(
            _topk_sets(
                sim.prefix_rerank_topk(
                    emb, q, k=10, prefix_dims=32, shortlist=shortlist
                )
            ),
            exact,
        )
        print(
            f"prefix_rerank 32d/{shortlist:<5d} recall@10 = {r:.3f}"
            f"  (shortlist frac {shortlist / n:.3f}; pytest gate 0.8 at frac 0.05)"
        )

    for n_cells in (8, 32):
        for n_probe in (1, 2, 3, 4, 6, 8):
            if n_probe > n_cells:
                continue
            ivf = sim.ivf_topk(emb, q, k=10, n_cells=n_cells, n_probe=n_probe)
            r = _recall(_topk_sets(ivf), exact)
            frac = n_probe / n_cells
            print(
                f"ivf cells={n_cells:2d} probe={n_probe}  "
                f"recall@10 = {r:.3f}  (probe frac {frac:.2f})"
            )

    # multi-table sign-LSH (round 8): recall vs table count, with the
    # candidate volume that buys it — the exponential-miss/linear-cost
    # trade stated in lsh_bucketed_topk's docstring, measured.  Self-
    # search (queries = corpus), so candidates are bucket-pair counts.
    for n_tables in (1, 2, 4):
        out = sim.lsh_bucketed_topk(
            emb, k=10, dim=64, n_planes=8, n_tables=n_tables
        )
        qs = {r["query_id"] for r in out.select("query_id").distinct().collect()}
        approx = _topk_sets(out.join(q.select(F.col("vec_id").alias("query_id")), "query_id"))
        r = _recall(approx, exact)
        print(
            f"lsh 8-plane tables={n_tables}  recall@10 = {r:.3f}  "
            f"(queries served {len(qs)}/{n})"
        )
    emb.unpersist()


if __name__ == "__main__":
    main()
