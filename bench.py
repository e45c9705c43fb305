"""Benchmark harness: times every registered query key at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with .count() (full compute, no driver-side
materialization of result rows — matches how a sink would consume it).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hive_similarity_join_spark.registry import QUERIES, load_registry
from hive_similarity_join_spark.session import DEFAULT_SHUFFLE_PARTITIONS, get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    load_registry()
    spark = get_spark("bench", shuffle_partitions=DEFAULT_SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + parquet-footer warmup so q1 doesn't pay session startup.
    QUERIES["q_scan_project"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for key in sorted(QUERIES):
        t0 = time.time()
        try:
            QUERIES[key](spark, sf_dir).count()
            timings[key] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line well-formed
            timings[key] = -1.0
            print(f"bench error {key}: {e}", file=sys.stderr)
        # drop relations the query persisted: each key is timed cold on
        # its own merits, and 65 keys' caches otherwise accumulate heap
        # pressure that taxes whoever runs last
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Full per-key timings go to BENCH_LOCAL.json; the stdout line stays
    # compact (round 1's 3.5 KB line overflowed the driver's tail capture
    # -> BENCH_r01 "parsed": null). Headline keys only.
    payload = json.dumps(
        {
            "metric": "wall_clock_all_query_keys",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        indent=1,
    )
    here = Path(__file__).resolve().parent
    (here / "BENCH_LOCAL.json").write_text(payload)
    # `--record` = the builder's same-boot recording (the one BASELINE.md
    # cites). The driver's harness invokes plain `python bench.py` and so
    # only ever rewrites BENCH_LOCAL.json — BENCH_BOOT.json survives the
    # round boundary (rounds 3 and 4 both lost the builder's recording to
    # the driver's clobber of BENCH_LOCAL.json).
    if "--record" in sys.argv[1:]:
        # Stamp the recording so regen_baseline_table.py can derive the
        # BASELINE.md header label instead of baking literals (ADVICE
        # r14 #1). `--round N` is the builder-asserted round number.
        import datetime

        rec = json.loads(payload)
        rec["recorded"] = datetime.date.today().isoformat()
        if "--round" in sys.argv[1:]:
            rec["round"] = int(sys.argv[sys.argv.index("--round") + 1])
        (here / "BENCH_BOOT.json").write_text(json.dumps(rec, indent=1))
    headline = [
        "q_simjoin_jaccard_self",
        "q_simjoin_topk",
        "q_dedup_minhash_lsh",
        "q_dedup_near",
        "q_dedup_connected",
        "q_dedup_representatives",
        "q_vec_knn",
        "q_knn_topk",
        "q_tpch_q1",
        "q_tpch_q9",
        "q_tpch_q18",
        "q_pipeline_corpus_clean",
        "q_stream_session",
        "q_decontaminate",
        "q_search_bm25",
        "q_simjoin_containment",
        "q_vec_knn_quantized",
        "q_dedup_incremental",
        "q_graph_pagerank",
    ]
    print(
        json.dumps(
            {
                "metric": "wall_clock_all_query_keys",
                "value": total,
                "unit": "sec",
                "queries": {k: timings[k] for k in headline if k in timings},
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
