"""Rewrite BASELINE.md's recorded table from BENCH_BOOT.json.

Usage: python tools/record_baseline.py
Keeps the prose header (everything up to the table) as maintained by
hand in _HEADER below; regenerates the per-key table and total from the
builder's same-boot recording (bench.py --record).
"""

from __future__ import annotations

import json
from datetime import date
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_HEADER = """# BASELINE — performance baseline (SURVEY.md §6)

**No published benchmark numbers exist for the reference** (empty
snapshot, see SURVEY.md §0). Per §6, the implementation session
records its own wall-clock numbers; these become the regression bar the
driver's 2x bench gate compares against.

## Measured baseline (round 9 final, re-recorded {today}, {nkeys} keys)

Config: local[32], PySpark 4.1.2, AQE on, shuffle.partitions=32,
sf0.1, warm JVM, each key forced via `.count()` with the catalog cache
cleared between keys (cold per-key timings). Produced by
`python bench.py --record` (BENCH_BOOT.json holds this run's full
payload and survives round boundaries; BENCH_LOCAL.json is rewritten
by every bench invocation, including the driver's).

**Total: {total} s across {nkeys} query keys.**

NOTE ON RUN-TO-RUN VARIANCE: this VM's absolute wall-clock moves
2-10x between AND within boots with identical code (round-3
measurements: q_knn_topk 2.8s -> 28s -> 75s across sessions minutes
apart; the round-3 driver bench ran this code family at 498s where
that boot's builder recording was 239s). Treat cross-run totals as
environment noise; only structural plan properties (job counts —
pytest-asserted in tests/test_plans.py::test_heavy_key_job_count_
tripwire — duplicate-subplan elimination, exchange shapes; see
PLANS.md) are trusted as perf evidence. Fresh round-5 within-boot
evidence: three same-code runs minutes apart totaled 264 / 369 /
297 s, with the middle run spiking q_simjoin_dice 4.5s -> 38.1s and
q_simjoin_edit_scalable 3.5s -> 27.2s and the next run restoring both
— single-key driver-bench spikes of this size are noise, not
regressions; adjudicate per-key ratios against FIXTURES.md output
anchors before touching any plan.

ROUND-5 ADJUDICATION of the round-4 driver-bench rises (VERDICT r4
"What's wrong #1"): the FIXTURES.md round-5 anchors show the sf0.1
pair/candidate counts are BIT-IDENTICAL across the round-boundary
regeneration (seeded generator — no duplicate-density drift), and this
boot's recording puts every flagged key back at its old level with NO
code change on its path (q_dedup_near 6.0s vs the 20.7s the r4 driver
measured; q_dedup_minhash_lsh ~9s vs 21.0; q_simjoin_topk ~11.6 vs
20.1). The monotone r2->r4 rise was boot-to-boot VM noise — confirmed
twice over by the within-boot kernel-vs-key A/B in FIXTURES.md (the
dedup logic adds ~nothing over the raw kernel join; the keys are
output-bound). Band-seeding the CC labels (the other r4 suggestion)
was analyzed and is UNSAFE: after Jaccard verification an LSH-bucket
co-member need not be connected, so a bucket-min seed can label a node
with an id outside its true component (FIXTURES.md round-5 notes).

The heavy tail (q_simjoin_topk, q_dedup_*, the t=0.9 similarity and
containment keys) is output-bound on the duplicate-heavy documents
table: 965k true pairs at t=0.9 / 1.0M ordered containment pairs over
5k docs — the join IS the output there. New in round 5: the five
privacy/hygiene keys (hygiene_q.py), the asymmetric containment pair
(q_simjoin_containment / q_dedup_containment), rarity-weighted
containment (q_simjoin_weighted_containment), SCD2 + retention
(q_scd2_history / q_retention_cohorts), and the SQ8 pair
(q_vec_quantize / q_vec_knn_quantized) — all <=11s, most sub-1s.

ROUND-9 RECORDING NOTES: final same-boot re-recording after the
round-9 build: 24 new keys (~57 s recorded, dominated by the audit
family that deliberately re-runs pair generators — q_dedup_lsh_recall
21.8 s composes the exact self-join AND the LSH join to measure pair
recall; q_docs_dup_matrix ~10 s and q_graph_degree_dist ~8.6 s are
pair-graph consumers; everything else is sub-3 s). This boot measures
a uniform ~1.0x global factor vs the round-8 driver bench over the 19
shared headline keys (tools/bench_compare.py, zero per-key deviations
— no plan regressed through the round-9 lifecycle changes: tracked
pins, ranked_topk, registry wrapper). q_graph_degree_dist's pin of
the pair relation halved it within-boot (28 s -> 14 s cold; 14.3 ->
8.6 recorded warm).

| query key | sec (sf0.1) |
|---|---|
"""


def main() -> None:
    boot = json.loads((ROOT / "BENCH_BOOT.json").read_text())
    q = boot["queries"]
    lines = [
        _HEADER.format(
            today=date.today().isoformat(),
            nkeys=len(q),
            total=boot["value"],
        )
    ]
    for k in sorted(q):
        lines.append(f"| {k} | {q[k]:.2f} |\n")
    (ROOT / "BASELINE.md").write_text("".join(lines))
    print(f"wrote BASELINE.md: {len(q)} keys, total {boot['value']} s")


if __name__ == "__main__":
    main()
