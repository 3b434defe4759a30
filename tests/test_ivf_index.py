"""IVF index maintenance (round 8): a production inverted-file index is
BUILT once and then MAINTAINED — new batches are assigned to the existing
cells without refitting KMeans (refit would reshuffle every stored
vector's cell and invalidate the layout).  These tests pin the
build/assign/search decomposition in llmdata/similarity.py:

* ``ivf_build`` — fit once, return (centers, assigned corpus frame);
* ``ivf_assign`` — distributed nearest-center assignment of a NEW batch
  against literal centers (no fit, no driver loop), the incremental
  ingest path;
* ``ivf_topk_indexed`` — search a prebuilt assigned frame, equal by
  construction to ``ivf_topk`` when given the same index.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from puma_matcher_spark.llmdata import similarity as sim


def _emb(spark, n, seed, start=0, dim=8):
    rng = random.Random(seed)
    rows = [
        (start + i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.mark.slow
def test_ivf_topk_indexed_equals_monolithic(spark):
    """Search over a prebuilt index must reproduce ivf_topk exactly
    (same seed → same KMeans centers → same cells → same rerank)."""
    emb = _emb(spark, 200, seed=7)
    q = emb.where(F.col("vec_id") % 25 == 0)
    mono = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim.ivf_topk(emb, q, k=5, n_cells=4, n_probe=2).collect()
    }
    centers, assigned = sim.ivf_build(emb, n_cells=4, seed=42)
    indexed = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim.ivf_topk_indexed(
            assigned, centers, q, k=5, n_probe=2
        ).collect()
    }
    assert indexed == mono


def test_ivf_assign_matches_build_assignment(spark):
    """Assigning the SAME corpus against the built centers reproduces the
    build's own cell assignment — the distributed argmin is the model's
    transform."""
    emb = _emb(spark, 150, seed=9)
    centers, assigned = sim.ivf_build(emb, n_cells=4, seed=42)
    re = sim.ivf_assign(emb, centers)
    a = {(r["vec_id"], r["cell"]) for r in assigned.select("vec_id", "cell").collect()}
    b = {(r["vec_id"], r["cell"]) for r in re.select("vec_id", "cell").collect()}
    assert a == b


def test_ivf_incremental_ingest_searchable_without_refit(spark):
    """The maintenance contract: union(build(corpus), assign(batch)) is
    searchable and finds a planted near-duplicate from the NEW batch at
    rank 1 — no refit, centers unchanged."""
    emb = _emb(spark, 200, seed=7)
    centers, assigned = sim.ivf_build(emb, n_cells=4, seed=42)
    # new batch: a near-copy of vector 0 plus unrelated vectors
    base = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    near = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    batch = _emb(spark, 20, seed=31, start=1000).unionByName(
        spark.createDataFrame([(999, near)], ["vec_id", "embedding"])
    )
    combined = assigned.unionByName(sim.ivf_assign(batch, centers))
    q = emb.where(F.col("vec_id") == 0)
    out = sim.ivf_topk_indexed(combined, centers, q, k=3, n_probe=2).collect()
    top = [r["neighbor_id"] for r in out if r["query_id"] == 0]
    assert top and top[0] == 999, top


def test_ivf_assign_filters_invalid_vectors(spark):
    """The incremental path inherits the validity contract: NULL/empty/
    zero-norm batch rows are not indexable."""
    emb = _emb(spark, 60, seed=3)
    centers, _ = sim.ivf_build(emb, n_cells=2, seed=42)
    batch = spark.createDataFrame(
        [
            (500, [1.0] * 8),
            (501, None),
            (502, []),
            (503, [0.0] * 8),
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {r["vec_id"] for r in sim.ivf_assign(batch, centers).collect()}
    assert got == {500}


def test_ivf_assign_is_map_side_only(spark):
    """The incremental-ingest promise is structural: assigning a batch
    against literal centers must plan as scan→project/filter with NO
    exchange — indexing cost stays one scan at any corpus size."""
    emb = _emb(spark, 60, seed=3)
    centers, _ = sim.ivf_build(emb, n_cells=2, seed=42)
    plan = (
        sim.ivf_assign(_emb(spark, 40, seed=5, start=200), centers)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_ivf_refit_report_quiet_on_in_distribution_batch(spark):
    """The refit gate must stay quiet when a new batch is drawn from the
    SAME distribution the index was built on — otherwise every batch
    triggers a rebuild and the gate is useless."""
    emb = _emb(spark, 400, seed=7)
    centers, _ = sim.ivf_build(emb, n_cells=4, seed=42)
    batch = _emb(spark, 400, seed=99, start=1000)  # fresh same-dist draw
    report = sim.ivf_refit_report(batch, centers).collect()
    assert len(report) == 4  # one row per cell, always
    assert not any(r["needs_refit"] for r in report), report
    assert sum(r["n_vectors"] for r in report) == 400
    assert abs(sum(r["occupancy_share"] for r in report) - 1.0) < 1e-6


def test_ivf_refit_report_fires_on_shifted_batch(spark):
    """A strongly shifted batch (constant offset far outside the build
    distribution) must flag at least one cell — the documented trigger
    to schedule an ivf_build rebuild."""
    emb = _emb(spark, 400, seed=7)
    centers, _ = sim.ivf_build(emb, n_cells=4, seed=42)
    rng = random.Random(5)
    shifted = spark.createDataFrame(
        [
            (2000 + i, [rng.gauss(0, 1) + 25.0 for _ in range(8)])
            for i in range(200)
        ],
        ["vec_id", "embedding"],
    )
    report = sim.ivf_refit_report(shifted, centers).collect()
    flagged = [r for r in report if r["needs_refit"]]
    assert flagged, report
    # the shift piles the whole batch into few cells AND drags the
    # in-cell mean far from the stored center — both signals fire
    assert any(
        r["occupancy_share"] > 0.5 or (r["drift_norm"] or 0) > 0.5
        for r in flagged
    )
    # untouched cells still report, unflagged, with zero share
    empty = [r for r in report if r["n_vectors"] == 0]
    for r in empty:
        assert not r["needs_refit"] and r["drift"] is None


def test_ivf_refit_occupancy_signal_alive_with_few_cells(spark):
    """With n_cells <= occupancy_skew_threshold the raw cutoff
    threshold/n_cells reaches >= 1.0, which no share can exceed — the
    skew signal would silently die (r9 ADVICE #2).  The cutoff is capped
    strictly below 1.0, so a batch piling ENTIRELY into one cell (zero
    drift: batch mean == stored center) must still flag it."""
    centers = [[1.0, 1.0], [10.0, 10.0]]
    batch = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(50)], ["vec_id", "embedding"]
    )
    # default occupancy_skew_threshold=4.0 over 2 cells -> raw cutoff 2.0
    report = {
        r["cell"]: r
        for r in sim.ivf_refit_report(batch, centers).collect()
    }
    assert report[0]["occupancy_share"] == 1.0
    assert report[0]["drift"] == 0.0  # drift contributes nothing here
    assert report[0]["needs_refit"], report
    assert not report[1]["needs_refit"]
