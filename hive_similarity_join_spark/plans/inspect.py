"""Physical-plan inspection helpers (E1 lifecycle tooling).

The engine's performance contract is expressed as plan properties —
filters reach the parquet scan, projections prune the read schema,
dimension joins broadcast, hot paths stay inside whole-stage codegen
with no Python evaluation nodes. These helpers make those properties
assertable in tests instead of hoped-for.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (DataFrame.explain only prints)."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode.upper()
        )
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str, absent: tuple[str, ...] = ()) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    for n in absent:
        assert n not in plan, f"did NOT expect {n!r} in plan:\n{plan}"
    return plan
