"""Round-start physical-schema audit (CLAUDE.md checklist item).

The driver regenerates /root/testdata at round boundaries and physical
parquet types are NOT stable across generations (events.ts flipped
TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) at the round-3 boundary and
silently broke every events key until the loader grew both legs).
This prints every table's pyarrow schema and flags the known-volatile
columns so a flip is visible before any query runs.

Usage: python tools/schema_dump.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

# Columns that have already changed physical type between rounds, with
# the legs the loader handles (sources/loader.py). A NEW type here means
# the loader needs another leg.
KNOWN_VOLATILE = {
    ("events", "ts"): {"timestamp[ns]", "timestamp[us]"},
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    problems = 0
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        table = os.path.basename(path).removesuffix(".parquet")
        schema = pq.read_schema(path)
        print(table)
        for field in schema:
            mark = ""
            known = KNOWN_VOLATILE.get((table, field.name))
            if known is not None:
                if str(field.type) in known:
                    mark = "  [volatile: handled leg]"
                else:
                    mark = "  [VOLATILE: *** NEW PHYSICAL TYPE — teach the loader ***]"
                    problems += 1
            print(f"  {field.name}: {field.type}{mark}")
    if problems:
        print(f"\n{problems} unhandled physical-type change(s) — fix the loader first")
    else:
        print("\nall volatile columns are on known-handled legs")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
