"""Semantic invariants for the round-6 drift/collocation operators —
the oracle sweep proves Spark↔DuckDB agreement; these prove the MATH
means what the docstrings claim."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F


def test_psi_is_zero_for_identical_halves(spark):
    """A value distribution that is identical in both time halves must
    score (near-)zero PSI in every bucket."""
    from puma_matcher_spark.operators.events_analytics import (
        population_stability,
    )

    rows = []
    for half, base in ((0, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2))):
        for i in range(500):
            rows.append(
                (
                    half * 500 + i,
                    datetime(2024, 1, 1 + half, i % 24, i % 60),
                    float(i % 200),
                )
            )
    events = spark.createDataFrame(rows, "event_id LONG, ts TIMESTAMP_NTZ, value DOUBLE")
    out = population_stability(events).collect()
    assert len(out) == 20
    total = sum(r["psi_contrib"] for r in out)
    assert abs(total) < 0.01, total
    assert all(r["n_ref"] == r["n_cur"] for r in out if r["n_ref"] > 0)


def test_psi_detects_a_shifted_distribution(spark):
    """Shifting the second half's values by +250 must push total PSI far
    beyond the classic 0.2 action threshold."""
    from puma_matcher_spark.operators.events_analytics import (
        population_stability,
    )

    rows = []
    for i in range(500):
        rows.append((i, datetime(2024, 1, 1, i % 24), float(i % 100)))
        rows.append((500 + i, datetime(2024, 1, 5, i % 24), 250.0 + i % 100))
    events = spark.createDataFrame(rows, "event_id LONG, ts TIMESTAMP_NTZ, value DOUBLE")
    total = sum(
        r["psi_contrib"] for r in population_stability(events).collect()
    )
    assert total > 0.2, total


def test_pmi_ranks_exclusive_pairs_above_chance_pairs(spark):
    """A bigram whose words only ever occur together must out-score one
    whose words co-occur at chance rate, and its PMI must match the
    closed-form ln(p(ab)/(p(a)p(b))) on the toy corpus."""
    from puma_matcher_spark.llmdata.textstats import pmi_bigrams

    # 'neutron flux' always adjacent; filler words combine freely
    docs = spark.createDataFrame(
        [(i, "neutron flux " + "the of " * 10) for i in range(10)],
        ["doc_id", "text"],
    )
    out = {(r["w1"], r["w2"]): r for r in pmi_bigrams(docs, min_count=5).collect()}
    nf = out[("neutron", "flux")]
    assert nf["n_pair"] == 10
    # corpus: per doc 22 tokens (21 bigrams): neutron x1, flux x1, the x10, of x10
    n_uni, n_bi = 220.0, 210.0
    expect = math.log((10 / n_bi) / ((10 / n_uni) * (10 / n_uni)))
    assert abs(nf["pmi"] - round(expect, 4)) < 1e-9
    assert nf["pmi"] > out[("the", "of")]["pmi"]


def test_psi_degenerate_single_instant_window(spark):
    """All events at ONE timestamp: the midpoint equals it, everything
    lands in the reference half, and add-one smoothing keeps every log
    term finite — no NaN/Inf rows."""
    from puma_matcher_spark.operators.events_analytics import (
        population_stability,
    )

    events = spark.createDataFrame(
        [(i, datetime(2024, 1, 1), float(i)) for i in range(50)],
        "event_id LONG, ts TIMESTAMP_NTZ, value DOUBLE",
    )
    rows = population_stability(events).collect()
    assert len(rows) == 20
    assert all(
        r["psi_contrib"] is not None and math.isfinite(r["psi_contrib"])
        for r in rows
    )
    assert sum(r["n_cur"] for r in rows) == 0


def test_psi_negative_values_clamp_into_bucket_zero(spark):
    """Negative values must clamp into bucket 0, not fall off the dense
    grid: the bucket totals have to account for EVERY event, so PSI is
    computed over the full distribution (ADVICE r6)."""
    from puma_matcher_spark.operators.events_analytics import (
        population_stability,
    )

    rows = [(i, datetime(2024, 1, 1, i % 24), -50.0 - i) for i in range(30)]
    rows += [(100 + i, datetime(2024, 1, 5, i % 24), float(i)) for i in range(30)]
    events = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP_NTZ, value DOUBLE"
    )
    out = population_stability(events).collect()
    assert sum(r["n_ref"] + r["n_cur"] for r in out) == 60  # nothing dropped
    b0 = next(r for r in out if r["bucket"] == 0)
    assert b0["n_ref"] == 30  # all negatives landed in bucket 0


def test_pmi_empty_and_single_token_docs(spark):
    """Docs below the bigram length threshold contribute nothing and
    must not break the pair builder."""
    from puma_matcher_spark.llmdata.textstats import pmi_bigrams

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "  "), (4, "neutron flux " * 6)],
        ["doc_id", "text"],
    )
    out = pmi_bigrams(docs, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in out][0] in {
        ("neutron", "flux"), ("flux", "neutron"),
    }
