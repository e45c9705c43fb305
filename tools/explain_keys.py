"""Dump .explain('formatted') for the given query keys to files.

Usage: python tools/explain_keys.py OUTDIR TAG key [key ...]
       (env SPARK_GRAFT_SF_DIR overrides the default sf0.001 data dir)

Writes OUTDIR/<key>_<TAG>.txt — the before/after plan evidence the
optimization rounds commit under plans/r16/. Uses sf0.001 by default:
plan SHAPE (exchanges, join strategies, pushed filters, cached scans)
is scale-independent, and several builders run eager driver rounds
(CC convergence probes, BPE merge collects) at build time, which at
sf0.1 would take minutes per key.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_similarity_join_spark.plans.inspect import explain_str
from hive_similarity_join_spark.registry import QUERIES, load_registry
from hive_similarity_join_spark.session import DEFAULT_SHUFFLE_PARTITIONS, get_spark


def main() -> None:
    outdir, tag, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    load_registry()
    spark = get_spark("explain_keys", shuffle_partitions=DEFAULT_SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    for key in keys:
        spark.sparkContext.setJobDescription(f"explain {key}")
        df = QUERIES[key](spark, sf_dir)
        text = f"-- {key} @ {sf_dir} ({tag})\n" + explain_str(df)
        (out / f"{key}_{tag}.txt").write_text(text)
        print(f"wrote {key}_{tag}.txt")


if __name__ == "__main__":
    main()
