"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at the
given scale factor, then compares: row count, sorted column names, and
order-insensitive values (exact for non-floats; floats reported with max
abs diff so any non-bit-exact computation gets flagged and fixed at the
query level — the goal is EXACT match, tolerance is only diagnostic).

Usage:  python tools/selfcheck.py [sf_dir] [key ...]
        python tools/selfcheck.py [sf_dir] --window   # the driver's 50-key window
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_similarity_join_spark.registry import ORACLES, QUERIES, load_registry
from hive_similarity_join_spark.session import DEFAULT_SHUFFLE_PARTITIONS, get_spark


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            if not np.array_equal(av.values, bv.values, equal_nan=True):
                diff = np.nanmax(np.abs(av.values - bv.values))
                problems.append(f"float col {c!r} not bit-exact (max abs diff {diff:.3e})")
        else:
            if not av.equals(bv):
                neq = (av != bv) & ~(av.isna() & bv.isna())
                idx = neq[neq].index[:3].tolist()
                problems.append(
                    f"col {c!r} differs at rows {idx}: "
                    f"spark={av.loc[idx].tolist()} duck={bv.loc[idx].tolist()} "
                    f"(dtypes {av.dtype}/{bv.dtype})"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_registry()
    keys = sys.argv[2:] or list(QUERIES)
    if keys == ["--window"]:
        # exactly the driver's CORRECTNESS window: the first 50 keys in
        # queries() insertion order (registry.ordered / PRIORITY)
        from hive_similarity_join_spark.registry import ordered

        keys = list(ordered(QUERIES))[:50]
    spark = get_spark("selfcheck", shuffle_partitions=DEFAULT_SHUFFLE_PARTITIONS)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for key in keys:
        t0 = time.time()
        try:
            sdf = QUERIES[key](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {key}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        finally:
            # some builders persist() intermediates (CMS token counts,
            # pipeline survivor relations); drop them per key so a full
            # 164-key run doesn't accumulate cached relations (bench.py
            # does the same)
            spark.catalog.clearCache()
        if key not in ORACLES:
            print(f"ROWS  {key}: {len(sdf)} rows (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(ORACLES[key]).fetchdf()
        except Exception as e:
            print(f"FAIL  {key}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {key}: [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"OK    {key}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(keys) - failures}/{len(keys)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
