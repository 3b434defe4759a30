"""Pre-flight for the driver's CORRECTNESS gate: run the SAME comparison the
driver runs (first 50 queries of the ordered registry, sf0.01 DuckDB oracle,
rows + schema + order-insensitive values) so any mismatch is caught locally
before round submission.

Usage:  python scripts/driver_gate_check.py [sf_dir] [window]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.oracle import compare_query, duck_connection
from puma_matcher_spark.queries import _ordered
from puma_matcher_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: window freshness policy: every exported query must earn a hard driver
#: CORRECTNESS row at least every MAX_ROW_AGE rounds.  Capacity arithmetic
#: fixes the bound: 50 window slots/round x 4 rounds = 200 >= exported
#: count, so age <= 4 is the tightest standing invariant the window can
#: sustain (age <= 3 would cap the registry at 150 exported).
MAX_ROW_AGE = 4
#: net-new exported queries per round must fit the window alongside the
#: oldest-cohort rotation: 50 slots - ~40 rotation slots => budget 10.
NET_NEW_BUDGET = 10
WINDOW = 50


def freshness_audit(verbose: bool = True, window_size: int = WINDOW) -> list[str]:
    """Project every exported query's driver-row age through this round's
    window; return violation strings (empty == policy holds).

    'This round' is inferred as max(N of CORRECTNESS_rN.json) + 1.  A query
    inside the current window is treated as re-greened this round (the
    spark gate below is what actually proves it).
    """
    import glob
    import json
    import re

    last: dict[str, int] = {}
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        for k, v in json.load(open(p)).items():
            if v.get("err") is None and v.get("rows_match"):
                last[k] = max(last.get(k, 0), r)
    this_round = (max(rounds) + 1) if rounds else 1
    exported = list(_ordered().keys())
    window = set(exported[:window_size])
    problems: list[str] = []
    if len(exported) > window_size * MAX_ROW_AGE:
        problems.append(
            f"registry infeasible: {len(exported)} exported > "
            f"{window_size}*{MAX_ROW_AGE} window capacity — retire or merge queries"
        )
    net_new = [n for n in exported if n not in last]
    if len(net_new) > NET_NEW_BUDGET:
        problems.append(
            f"net-new budget exceeded: {len(net_new)} queries have no prior "
            f"driver row (budget {NET_NEW_BUDGET}): {net_new}"
        )
    orphans = [n for n in net_new if n not in window]
    if orphans:
        problems.append(f"net-new queries outside the window: {orphans}")
    stale = []
    for n in exported:
        if n in window:
            continue  # earns a row this round
        age = this_round - last.get(n, 0)
        if n not in last:
            stale.append((n, "never"))
        elif age > MAX_ROW_AGE:
            stale.append((n, age))
    if stale:
        problems.append(
            f"row-age > {MAX_ROW_AGE} rounds after this window: {stale}"
        )
    if verbose:
        ages: dict = {}
        for n in exported:
            if n in window:
                a = 0
            elif n not in last:
                # a never-rowed query outside the window has no age —
                # count it under its own key instead of a misleading 0
                a = "never"
            else:
                a = this_round - last[n]
            ages[a] = ages.get(a, 0) + 1
        hist = dict(sorted(ages.items(), key=lambda kv: (isinstance(kv[0], str), kv[0])))
        print(
            f"[freshness] round {this_round}: projected age histogram "
            f"{hist}, net-new {len(net_new)}/{NET_NEW_BUDGET}"
        )
        for p in problems:
            print(f"[freshness] VIOLATION: {p}")
        if not problems:
            print("[freshness] policy holds")
    return problems


def plan_next_window() -> None:
    """Print next round's rotation plan: the cohort that MUST re-green
    (hits MAX_ROW_AGE next round), then younger cohorts oldest-first to
    fill the remaining slots — paste-ready for the _PRIORITY update."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        for k, v in json.load(open(p)).items():
            if v.get("err") is None and v.get("rows_match"):
                last[k] = max(last.get(k, 0), r)
    nxt = (max(rounds) + 2) if rounds else 1  # the round AFTER this one
    exported = list(_ordered().keys())
    by_round: dict[int, list[str]] = {}
    for n in exported:
        by_round.setdefault(last.get(n, 0), []).append(n)
    slots = WINDOW
    print(f"# next-round (r{nxt - 1} window plan), {slots} slots:")
    for r in sorted(by_round):
        names = sorted(by_round[r])
        age_next = nxt - 1 - r
        tag = "MUST re-green (hits age boundary)" if age_next >= MAX_ROW_AGE else f"age {age_next}"
        take = names[:slots]
        slots -= len(take)
        print(f"## last green r{r} — {tag} — {len(names)} names"
              f"{' (fits ' + str(len(take)) + ')' if len(take) < len(names) else ''}:")
        for n in take:
            print(f'    "{n}",')
        if slots <= 0:
            break
    print(f"# remaining slots after rotation: {max(slots, 0)} (net-new budget {NET_NEW_BUDGET})")


#: the four adversarial-zoo broad-parity sweeps.  Every one auto-includes
#: any registered query whose oracle touches its table, so running them
#: as a gate pre-flight means a net-new or changed-plan export cannot
#: ship zoo-red the way round-9 shipped ivf_cell_report (driver fixture
#: green, zoo's negative label crashing — the exact fixture-blindness
#: the zoos exist to catch).
ZOO_SWEEPS = [
    "tests/test_embeddings_zoo.py::test_embeddings_zoo_broad_parity",
    "tests/test_relational_zoo.py::test_relational_zoo_broad_parity",
    "tests/test_llmdata.py::test_whitespace_zoo_broad_parity",
    "tests/test_streaming.py::test_events_zoo_broad_parity",
]


def run_zoo_sweeps() -> int:
    """Run the four zoo parity sweeps via pytest; returns the number of
    failing sweeps (0 == all green)."""
    import subprocess

    print(f"[zoo] pre-flight: {len(ZOO_SWEEPS)} adversarial-zoo sweeps")
    t0 = time.time()
    proc = subprocess.run(
        # -m "" overrides pytest.ini's default `-m "not slow"` fast-lane
        # filter (r12): the zoo sweeps are slow-marked, and a marker
        # filter DESELECTS even explicitly-named node ids — without the
        # override this would collect zero tests and read green/red
        # spuriously.
        [sys.executable, "-m", "pytest", "-q", "--no-header", "-m", "",
         *ZOO_SWEEPS],
        cwd=REPO,
    )
    status = "green" if proc.returncode == 0 else "RED"
    print(f"[zoo] sweeps {status}  ({time.time() - t0:.0f}s)")
    return 0 if proc.returncode == 0 else 1


def main() -> int:
    if "--plan-next" in sys.argv:
        plan_next_window()
        return 0
    if "--audit-only" in sys.argv:
        return 1 if freshness_audit() else 0
    if "--zoo-only" in sys.argv:
        return run_zoo_sweeps()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    window = int(args[1]) if len(args) > 1 else 50
    violations = freshness_audit(window_size=window)
    # zoo pre-flight BEFORE the gate (skippable for quick iteration with
    # --skip-zoos; the full pre-submission run must include it)
    n_zoo_fail = 0 if "--skip-zoos" in sys.argv else run_zoo_sweeps()
    spark = get_spark("driver-gate-check")
    con = duck_connection(sf_dir)
    ordered = list(_ordered().items())[:window]
    n_fail = 0
    for name, spec in ordered:
        t0 = time.time()
        if spec.oracle is None:
            try:
                rows = spec.spark_fn(spark, sf_dir).count()
                print(f"[rows-only] {name}: {rows} rows  ({time.time()-t0:.1f}s)")
            except Exception as e:
                n_fail += 1
                print(f"[FAIL] {name}: EXC {type(e).__name__}: {e}")
            continue
        try:
            res = compare_query(spark, con, name, spec.spark_fn, spec.oracle, sf_dir)
        except Exception as e:
            n_fail += 1
            print(f"[FAIL] {name}: EXC {type(e).__name__}: {e}")
            continue
        if not res.ok:
            n_fail += 1
        print(f"{res}  ({time.time()-t0:.1f}s)")
    print(f"\n{window - n_fail}/{window} pass")
    if violations:
        print(f"[freshness] {len(violations)} policy violation(s) — see above")
    if n_zoo_fail:
        print("[zoo] RED — a query diverges on an adversarial corpus")
    return 1 if (n_fail or violations or n_zoo_fail) else 0


if __name__ == "__main__":
    raise SystemExit(main())
