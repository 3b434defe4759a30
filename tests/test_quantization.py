"""Quality gates for the quantized / two-stage embedding search paths:
the approximations must recover most of the exact top-k.  (Value-level
oracle parity is covered by test_oracle_parity — these pin QUALITY.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from puma_matcher_spark.llmdata import similarity as sim
from puma_matcher_spark.sources.testdata import load_tables


def _topk_sets(df, id_col="neighbor_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r[id_col])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for qid, want in exact.items():
        got = approx.get(qid, set())
        hits += len(got & want)
        total += len(want)
    return hits / total


def test_int8_recall_vs_exact(spark, sf_small):
    emb = load_tables(spark, sf_small).llm_embeddings()
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))
    # int8 ranks by dot product (not cosine); on unit-ish random vectors
    # the orders still agree closely — require most of the top-10 back
    approx = _topk_sets(sim.int8_topk(emb, q, k=10))
    assert _recall(approx, exact) >= 0.9


def test_prefix_rerank_recall_vs_exact(spark, sf_small):
    emb = load_tables(spark, sf_small).llm_embeddings()
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))
    # the fixture's vectors are random — no Matryoshka prefix
    # concentration — so the coarse stage needs half the dims and a
    # 100-deep shortlist to recover most of the exact top-10
    two_stage = _topk_sets(
        sim.prefix_rerank_topk(emb, q, k=10, prefix_dims=32, shortlist=100)
    )
    assert _recall(two_stage, exact) >= 0.8


def test_quantize_int8_bounds_and_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    rows = {r["vec_id"]: r for r in sim.quantize_int8(df).collect()}
    # scale = 1/127; half-up: floor(-63.5 + 0.5) = -63, floor(31.75 + 0.5) = 32
    assert rows[1]["qvec"] == [127, -63, 32]
    assert rows[2]["qvec"] == [0, 0, 0] and rows[2]["scale"] == 0.0
    assert all(-127 <= v <= 127 for v in rows[1]["qvec"])
