"""The driver records bench.py's LAST ~2000 bytes of stdout and parses
the one JSON line out of it — in round 6 the dispersion sample arrays
pushed the line past that capture and BENCH_r06.json landed with
``parsed: null``.  These tests pin the contract so it cannot regress:
one line, compact separators, bounded length, dispersion in the
sidecar file only."""

from __future__ import annotations

import json


def _stdout_payload() -> dict:
    """The JSON payload main() prints, rebuilt with worst-case-width fake
    timings for every query currently in the bench groups."""
    import bench

    queries = {
        name: 123.456
        for name in (
            bench.BENCH_QUERIES
            + bench.BENCH_QUERIES_PLANES
            + bench.BENCH_QUERIES_ROUND6
            + ["media_decode_mixed", "streaming_ingest_120docs"]
        )
    }
    return {
        "metric": "headline_queries_total",
        "value": 1234.567,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "groups": {
            "spine_total": 1234.567,
            "operator_planes_total": 1234.567,
            "round6_total": 1234.567,
            "media_total": 1234.567,
            "streaming_total": 1234.567,
        },
    }


def test_bench_stdout_line_fits_the_driver_tail_capture():
    line = json.dumps(_stdout_payload(), separators=(",", ":"))
    assert "\n" not in line
    # 2000-byte driver tail minus headroom for a stray WARN line the
    # tail may also swallow
    assert len(line) <= 1800, (
        f"bench stdout line is {len(line)} bytes — the driver tail "
        "capture is ~2000; move payload to the BENCH_DISPERSION.json "
        "sidecar instead of growing the line"
    )


def test_bench_queries_are_registered_and_distinct():
    import bench

    from puma_matcher_spark.queries import REGISTRY

    names = (
        bench.BENCH_QUERIES
        + bench.BENCH_QUERIES_PLANES
        + bench.BENCH_QUERIES_ROUND6
    )
    assert len(names) == len(set(names)), "duplicate bench query"
    missing = [n for n in names if n not in REGISTRY]
    assert not missing, f"bench names not registered: {missing}"


def test_bench_compare_rejects_mismatched_sidecar(tmp_path):
    """ADVICE r7: the dispersion sidecar is stamped with (sf, spine_total);
    bench_compare must ignore a sidecar whose stamp disagrees with
    CURRENT (medians/MADs from a different run than the mins) and use a
    matching one."""
    import subprocess
    import sys as _sys

    cur = {
        "metric": "headline_queries_total",
        "value": 10.0,
        "unit": "sec",
        "queries": {"q1": 1.0},
        "sf": 0.1,
    }
    ref = {"queries": {"q1": 1.0}}
    (tmp_path / "cur.json").write_text(json.dumps(cur))
    (tmp_path / "ref.json").write_text(json.dumps(ref))
    stale = {
        "sf": 0.001,  # different run
        "spine_total": 99.9,
        "dispersion": {"q1": {"median": 50.0, "mad": 0.001}},
    }
    (tmp_path / "BENCH_DISPERSION.json").write_text(json.dumps(stale))
    out = subprocess.run(
        [_sys.executable, "scripts/bench_compare.py",
         str(tmp_path / "cur.json"), str(tmp_path / "ref.json")],
        capture_output=True, text=True,
    )
    assert "run stamp mismatch" in out.stderr
    # stale median (50.0) must NOT appear — fallback median == min
    assert " 50.000" not in out.stdout
    assert out.returncode == 0  # min==ref: noise, not drift

    good = {
        "sf": 0.1,
        "spine_total": 10.0,
        "dispersion": {"q1": {"median": 1.01, "mad": 0.02}},
    }
    (tmp_path / "BENCH_DISPERSION.json").write_text(json.dumps(good))
    out2 = subprocess.run(
        [_sys.executable, "scripts/bench_compare.py",
         str(tmp_path / "cur.json"), str(tmp_path / "ref.json")],
        capture_output=True, text=True,
    )
    assert "mismatch" not in out2.stderr
    assert " 1.010" in out2.stdout  # the matching sidecar's median is used
