#!/usr/bin/env python
"""Sign-LSH operating-point grid (round-9 verdict #7): the r8 study fixed
planes=8 and swept tables, concluding 8 planes is the wrong point for
near-isotropic 64-d embeddings — this sweeps BOTH axes (planes x tables)
on both geometries so `lsh_bucketed_topk` can document a selection rule.

For each (n_planes in {4, 6, 8}) x (n_tables in {1, 2, 4}) x geometry
(isotropic / clustered 20k-vector sf1 twins from scripts/gen_sf1.py):

* recall@10 of the bucketed rerank vs exact brute force on the 40-query
  subset (same methodology as scripts/ann_recall_sf1.py — the candidate
  generation is identical to lsh_bucketed_topk: union of per-table sign
  keys, collide on (table, bucket), distinct pair before the rank
  window; the query-side filter only skips reranking non-query rows);
* candidate volume = raw colliding ordered pairs across all tables over
  the FULL self-search (the bucket-join work a production run pays),
  reported as pairs-per-vector so corpus sizes compare.

Run: python scripts/gen_sf1.py && python scripts/lsh_grid_study.py (~10 min)
Results recorded in PLANS.md (round-9 LSH grid) and the
lsh_bucketed_topk docstring rule.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from puma_matcher_spark.functions.rounding import pround
from puma_matcher_spark.llmdata import similarity as sim
from puma_matcher_spark.session import get_spark

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data-sf1")


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


def grid_point(emb, q, exact, n, n_planes, n_tables):
    keys = None
    for ti in range(n_tables):
        kt = sim.sign_lsh_keys(emb, 64, n_planes, 42 + ti).withColumn(
            "_table", F.lit(ti)
        )
        keys = kt if keys is None else keys.unionByName(kt)
    keys = keys.persist()
    a_all = keys.select("_table", "bucket", F.col("vec_id").alias("query_id"))
    b = keys.select("_table", "bucket", F.col("vec_id").alias("neighbor_id"))
    cands = (
        a_all.join(b, ["_table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .count()
    )
    keyed = emb.join(keys, "vec_id")
    aq = keyed.join(
        q.select("vec_id"), "vec_id"
    ).select(
        "_table", "bucket", F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    bv = keyed.select(
        "_table", "bucket", F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
    )
    sims = (
        aq.join(bv, ["_table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            pround(
                sim.cosine(
                    F.col("q_vec").cast("array<double>"),
                    F.col("c_vec").cast("array<double>"),
                ),
                4,
            ).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    top = (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
    )
    r = _recall(_topk_sets(top), exact)
    keys.unpersist()
    return {
        "n_planes": n_planes,
        "n_tables": n_tables,
        "recall": round(r, 3),
        "cand_pairs_per_vec": round(cands / n, 1),
    }


def main() -> None:
    spark = get_spark("lsh-grid-study")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for fname, tag in (
        ("embeddings.parquet", "isotropic"),
        ("embeddings_clustered.parquet", "clustered"),
    ):
        path = os.path.join(DATA, fname)
        if not os.path.exists(path):
            raise SystemExit(f"{path} missing — run scripts/gen_sf1.py")
        emb = sim.valid_vectors(spark.read.parquet(path)).persist()
        n = emb.count()
        q = emb.where(F.col("vec_id") % 500 == 0)
        exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))
        rows = []
        for n_planes in (4, 6, 8):
            for n_tables in (1, 2, 4):
                row = grid_point(emb, q, exact, n, n_planes, n_tables)
                rows.append(row)
                print(json.dumps({"geometry": tag, **row}), file=sys.stderr)
        out[tag] = {"n_vectors": n, "grid": rows}
        emb.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
