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


def check_value_contracts(sf_dir: str) -> int:
    """Data contracts several keys assume but a round-boundary
    regeneration could silently break (ADVICE r11):

    - events.value has no NULLs (the percentile oracles were made
      NULL-symmetric defensively, but the streaming MAD mirror and the
      fence keys were only ever verified NULL-free);
    - events.value is cents-exact: floor(value*100 + 0.5)/100 == value,
      the precondition for incremental_rollup.mad_partials' integer
      bucketing being bit-equal to the batch key's double percentile.
    """
    import pyarrow.compute as pc

    path = f"{sf_dir}/events.parquet"
    if not os.path.exists(path):
        print("\n(no events table — value-contract checks skipped)")
        return 0
    value = pq.read_table(path, columns=["value"]).column("value")
    problems = 0
    n_null = value.null_count
    if n_null:
        print(f"\nCONTRACT BROKEN: events.value has {n_null} NULLs "
              "(keys were verified NULL-free; audit percentile/MAD keys)")
        problems += 1
    cents = pc.floor(pc.add(pc.multiply(value, 100.0), 0.5))
    bad = pc.sum(
        pc.cast(pc.not_equal(pc.divide(cents, 100.0), value), "int64")
    ).as_py() or 0
    if bad:
        print(f"\nCONTRACT BROKEN: events.value not cents-exact on {bad} "
              "row(s) — mad_partials' integer bucketing no longer mirrors "
              "the batch double percentile (incremental_rollup.py)")
        problems += 1
    if not problems:
        print("\nevents.value contracts hold (no NULLs, cents-exact)")
    return problems


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
    problems += check_value_contracts(sf_dir)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
