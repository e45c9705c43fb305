"""Adjudicate a bench run against the recorded baseline — automates the
CLAUDE.md discipline ("adjudicate per-key ratios against FIXTURES.md
output anchors before touching any plan"; boot-to-boot wall clock moves
2-10x, so only RATIO structure is meaningful).

Usage:
    python tools/bench_compare.py [CANDIDATE] [BASELINE]

Defaults: CANDIDATE = BENCH_LOCAL.json (what the last plain bench.py —
including the driver's — wrote), BASELINE = BENCH_BOOT.json (the
builder's same-boot recording BASELINE.md cites).

Output, one section each:
- keys missing from / new in the candidate (coverage drift);
- a global scale factor (median per-key ratio — boot noise moves ALL
  keys together, so the median is the boot-speed estimate);
- keys whose ratio deviates from that global factor by more than
  DEVIATION_X (these — and only these — are per-key regressions worth
  investigating; check FIXTURES.md anchors for density drift first);
- errored keys (timing -1).

Exit code 1 if any key errored, else 0 — deviations alone do not fail
(they are boot-noise candidates until adjudicated).
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

DEVIATION_X = 3.0   # flag keys this many times off the global factor
MIN_SECONDS = 0.5   # ignore deviation on keys faster than this (jitter)


def load(path: str) -> dict[str, float]:
    d = json.loads(Path(path).read_text())
    # accept the driver's BENCH_r{N}.json wrapper ({... "parsed": {...}}),
    # the bench.py payload ({"queries": {...}}), or a bare key->sec map
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items()}


def main() -> int:
    here = Path(__file__).resolve().parent.parent
    cand_path = sys.argv[1] if len(sys.argv) > 1 else str(here / "BENCH_LOCAL.json")
    base_path = sys.argv[2] if len(sys.argv) > 2 else str(here / "BENCH_BOOT.json")
    cand, base = load(cand_path), load(base_path)

    errored = sorted(k for k, v in cand.items() if v < 0)
    missing = sorted(set(base) - set(cand))
    new = sorted(set(cand) - set(base))
    def _brief(names: list[str]) -> str:
        return ", ".join(names[:8]) + (" ..." if len(names) > 8 else "")

    if missing:
        # a driver BENCH_r{N}.json carries only the ~17 headline keys;
        # a mostly-missing candidate is that, not coverage loss
        print(f"MISSING from candidate ({len(missing)}): {_brief(missing)}"
              + ("  <- headline-only record?" if len(missing) > 50 else ""))
    if new:
        print(f"NEW in candidate ({len(new)}): {_brief(new)}")
    if errored:
        print(f"ERRORED ({len(errored)}): {', '.join(errored)}")

    shared = [
        k for k in base
        if k in cand and cand[k] > 0 and base[k] > 0
    ]
    ratios = {k: cand[k] / base[k] for k in shared}
    if not ratios:
        print("no shared keys to compare")
        return 1 if errored else 0
    factor = statistics.median(ratios.values())
    print(
        f"global factor (median candidate/baseline ratio over "
        f"{len(ratios)} keys): {factor:.2f}x"
        + ("  <- boot speed, not a regression" if abs(factor - 1) > 0.2 else "")
    )

    flagged = sorted(
        (
            (k, ratios[k])
            for k in ratios
            if ratios[k] > factor * DEVIATION_X
            and max(cand[k], base[k]) >= MIN_SECONDS
        ),
        key=lambda kv: -kv[1],
    )
    if flagged:
        print(f"\nkeys > {DEVIATION_X}x off the global factor "
              "(adjudicate vs FIXTURES.md anchors before touching plans):")
        for k, r in flagged:
            print(f"  {r/factor:6.1f}x  {k}: {base[k]:.2f}s -> {cand[k]:.2f}s")
    else:
        print("no per-key deviation beyond the global factor — "
              "differences are boot noise")
    # The fast direction matters too: a key that got >Nx FASTER than the
    # boot factor may have silently lost coverage (a generator
    # short-circuiting, an accidentally-empty join side) — the wall
    # clock can't tell that apart from a win, so point at the anchors.
    fast = sorted(
        (
            (k, ratios[k])
            for k in ratios
            if ratios[k] < factor / DEVIATION_X
            and max(cand[k], base[k]) >= MIN_SECONDS
        ),
        key=lambda kv: kv[1],
    )
    if fast:
        print(f"\nkeys > {DEVIATION_X}x FASTER than the global factor "
              "(verify row counts vs FIXTURES.md anchors — a silent "
              "coverage loss looks exactly like a speedup):")
        for k, r in fast:
            print(f"  {factor/r:6.1f}x  {k}: {base[k]:.2f}s -> {cand[k]:.2f}s")
    return 1 if errored else 0


if __name__ == "__main__":
    raise SystemExit(main())
