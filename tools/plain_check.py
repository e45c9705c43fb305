"""Driver-mirror correctness check under a PLAIN SparkSession.

tools/selfcheck.py runs on get_spark's tuned session; the external
driver builds its OWN SparkSession with default confs
(shuffle.partitions=200) — and getOrCreate() silently drops builder
configs when a session already exists (CLAUDE.md, environment
limits). This script is the second leg of the verification battery:
the same bit-exact compare as selfcheck, on the driver's exact
session shape. Run it (at least for new/changed keys) after any
operator change.

Usage:  python tools/plain_check.py [key ...]       # default: all keys
        SF_DIR=/root/testdata/sf0.01 python tools/plain_check.py ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb
from pyspark.sql import SparkSession

from selfcheck import compare  # noqa: E402  (same compare as the t2 mirror)

from hive_similarity_join_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_registry,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    load_registry()
    keys = sys.argv[1:] or [k for k in QUERIES if k in ORACLES]
    # the point: NO builder configs — the driver's default session
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    fails = 0
    for key in keys:
        if key not in ORACLES:
            print(f"SKIP {key}: no oracle (rows-only key)")
            continue
        # per-key isolation like selfcheck: one raising key (e.g. a
        # round-boundary schema flip) must not abort the sweep
        try:
            sdf = QUERIES[key](spark, sf_dir).toPandas()
        except Exception as e:
            fails += 1
            print(f"FAIL {key}: spark raised {type(e).__name__}: {e}")
            continue
        finally:
            spark.catalog.clearCache()
        try:
            ddf = con.execute(ORACLES[key]).fetchdf()
        except Exception as e:
            fails += 1
            print(f"FAIL {key}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = compare(sdf, ddf)
        if problems:
            fails += 1
            print(f"FAIL {key}: {problems}")
        else:
            print(f"OK   {key}: {len(sdf)} rows")
    print(f"{len(keys) - fails}/{len(keys)} green (plain session)")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
