#!/usr/bin/env python
"""Attribute bench drift between two runs (VERDICT r5 #3): compare a
CURRENT bench.py JSON (with the round-6 ``dispersion`` median/MAD
samples) against a REFERENCE run's per-query values, and classify each
delta as noise or signal.

Classification: a query drifts if |median_now - ref| > max(3 * MAD_now,
0.05 s) — i.e. the reference value lies outside the current run's own
dispersion envelope by a margin no timer jitter explains.  With min-of-N
references (rounds 1-5 store only mins) the median-vs-min comparison is
conservative: medians sit above mins, so only flag when the MIN also
exceeds the envelope.

Usage: python scripts/bench_compare.py CURRENT.json REFERENCE.json
(REFERENCE may be a driver BENCH_r{N}.json wrapper or a raw bench line).
"""

from __future__ import annotations

import json
import sys


def _unwrap(blob: dict) -> dict:
    """Accept either a raw bench.py line or a driver BENCH_r{N}.json
    wrapper (the payload sits under 'parsed') — for BOTH arguments, so a
    swapped or driver-file CURRENT degrades gracefully instead of
    raising KeyError('queries')."""
    if "parsed" in blob:  # driver wrapper
        blob = blob["parsed"]
    if "queries" not in blob:
        raise SystemExit(
            "not a bench blob: expected a bench.py JSON line or a driver "
            f"BENCH_r{{N}}.json wrapper, got keys {sorted(blob)[:8]}"
        )
    return blob


def main() -> int:
    cur = _unwrap(json.load(open(sys.argv[1])))
    ref = _unwrap(json.load(open(sys.argv[2])))["queries"]
    disp = cur.get("dispersion", {})
    if not disp:
        # since r7 bench.py keeps the stdout line compact and writes
        # sample arrays to a sidecar next to bench.py / the CURRENT file.
        # The sidecar is stamped with the run's (sf, spine_total): accept
        # it only when both match CURRENT, else the median/MAD would come
        # from a DIFFERENT run than the mins (ADVICE r7).
        import os

        for cand in (
            os.path.join(os.path.dirname(os.path.abspath(sys.argv[1])), "BENCH_DISPERSION.json"),
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DISPERSION.json"),
        ):
            if not os.path.exists(cand):
                continue
            side = json.load(open(cand))
            sf_ok = side.get("sf") == cur.get("sf")
            tot_ok = ("spine_total" not in side) or (
                side["spine_total"] == cur.get("value")
            )
            if sf_ok and tot_ok:
                disp = side.get("dispersion", {})
                sent = side.get("sentinel", {}).get("samples")
                if sent:
                    # host-drift context (r11): the sentinel is a fixed
                    # codegen workload bracketing every group — wide
                    # spread here means the DRIFT verdicts below are
                    # measuring the box, not the code.  Spread is taken
                    # over the steady-state TAIL (last half, >= 3): the
                    # head of the series can still ride the JVM's
                    # deepening JIT, and a monotone warm-up step would
                    # otherwise read as host noise on every run (r11
                    # review).
                    tail = sent[-max(3, len(sent) // 2):]
                    spread = (max(tail) - min(tail)) / max(min(tail), 1e-9)
                    print(
                        f"sentinel: {sent} (tail spread {spread:.0%}"
                        f"{' — HOST NOISY, verdicts suspect' if spread > 0.3 else ''})"
                    )
                break
            print(
                f"WARNING: ignoring sidecar {cand} — run stamp mismatch "
                f"(sidecar sf={side.get('sf')} total={side.get('spine_total')}, "
                f"current sf={cur.get('sf')} total={cur.get('value')}); "
                "medians/MADs would come from a different run",
                file=sys.stderr,
            )
    drifted = []
    print(f"{'query':26s} {'ref-min':>8s} {'now-min':>8s} {'now-med':>8s} {'MAD':>6s}  verdict")
    for q, headline in cur["queries"].items():
        r = ref.get(q)
        if r is None:
            continue
        d = disp.get(q, {})
        # since r10 the headline is the MEDIAN for high-dispersion
        # queries (estimator tag in the sidecar) — the conservative
        # "only flag when the MIN also exceeds the envelope" guard must
        # compare the actual min-of-3, not the median masquerading as
        # one, or an unchanged noisy query reads as DRIFT by exactly
        # (median - min) (r10 review finding)
        now_min = d.get("min3", headline)
        med, mad = d.get("median", headline), d.get("mad", 0.0)
        envelope = max(3 * mad, 0.05)
        is_drift = abs(now_min - r) > envelope and abs(med - r) > envelope
        verdict = "DRIFT" if is_drift else "noise"
        if is_drift:
            drifted.append(q)
        print(f"{q:26s} {r:8.3f} {now_min:8.3f} {med:8.3f} {mad:6.3f}  {verdict}")
    print(f"\n{len(drifted)} drifted beyond the noise envelope: {drifted}")
    return 1 if drifted else 0


if __name__ == "__main__":
    raise SystemExit(main())
