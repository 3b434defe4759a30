"""The local correctness gate: every registered query with an oracle must
match DuckDB exactly at sf0.001 (the driver runs the same comparison at
sf0.01 — see __spark_entry__.py)."""

import pytest

from puma_matcher_spark.oracle import run_all
from puma_matcher_spark.queries import REGISTRY


@pytest.mark.slow
def test_all_queries_match_oracle(spark, sf_small):
    results = run_all(spark, sf_small)
    failed = [str(r) for r in results if not r.ok]
    assert not failed, "\n".join(failed)
    assert len(results) == len(
        [s for s in REGISTRY.values() if s.oracle is not None]
    )


@pytest.mark.slow
def test_rows_only_queries_execute(spark, sf_small):
    """Queries without oracles still must run and return a stable row
    count twice (determinism smoke)."""
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            continue
        n1 = spec.spark_fn(spark, sf_small).count()
        n2 = spec.spark_fn(spark, sf_small).count()
        assert n1 == n2, name
        assert n1 >= 0


def test_driver_window_budget():
    """The external driver's CORRECTNESS gate covers only the first 50
    entries of queries().  Every _PRIORITY name must exist, the list
    must fit inside the window (an overflow silently costs the last
    entries their driver row), and presentation order must start with
    exactly the priority list."""
    from puma_matcher_spark.queries import _PRIORITY, queries

    q = list(queries())
    missing = [n for n in _PRIORITY if n not in q]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert len(_PRIORITY) <= 50, (
        f"_PRIORITY has {len(_PRIORITY)} entries — the driver checks only "
        "the first 50 queries; trim already-green names"
    )
    assert q[: len(_PRIORITY)] == _PRIORITY
    assert len(set(_PRIORITY)) == len(_PRIORITY)


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {
        "id",
        "document_version1_id",
        "document_version2_id",
        "score",
        "score_type",
    }
    names = set(entry_mod.queries())
    assert set(entry_mod.oracle_sql()) <= names
