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
import re

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


#: Nodes that bound the row count flowing into a parent — a window over
#: any of these is serial-but-tiny (the sanctioned limit-then-rank
#: shape), not a scale problem.
_LIMIT_NODES = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit",
                "LocalLimit")

_TREE_RE = re.compile(
    r"^(?P<prefix>[\s:+|*-]*)(?P<name>[A-Za-z][A-Za-z0-9_]*)\s+\((?P<num>\d+)\)"
)


def unpartitioned_window_violations(plan: str) -> list[str]:
    """Scan a FORMATTED explain string for Window nodes with an empty
    PARTITION BY whose input is not bounded by a limit node.

    An unpartitioned window forces ``Exchange SinglePartition`` — the
    whole relation serializes through one task (WindowExec's "No
    Partition Defined" warning). That is a 100 TB killer unless the
    input is already bounded, so a Window is flagged when (a) its
    Arguments carry only two top-level bracket groups ``[exprs],
    [ordering]`` — three means a partition spec is present — and (b)
    no bounding node appears in its subtree. Bounding nodes:

    - a limit node (top-k ranked after ``.limit(k)``), or
    - an aggregate keyed EXACTLY by ``_ps_pid`` — the per-partition
      partials relation of :func:`operators.scan.grouped_prefix_scan`
      / :func:`operators.rank.ranked_by`, which is ≤ ``n_partitions``
      rows by construction (one row per spark_partition_id), so its
      exclusive-prefix window is tiny wherever the data size goes.

    Returns ``["Window(10) over unlimited input", ...]`` (empty = clean).
    """
    lines = plan.splitlines()
    # --- tree section(s): node name, number, indent depth ---
    tree: list[tuple[int, str, int]] = []  # (num, name, depth)
    for ln in lines:
        m = _TREE_RE.match(ln)
        if m:
            tree.append((int(m.group("num")), m.group("name"),
                         len(m.group("prefix"))))
    # --- detail section: Arguments + Keys lines per numbered node ---
    args: dict[int, str] = {}
    agg_keys: dict[int, str] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s+(\S+)", ln)
        if m:
            cur = int(m.group(1))
        elif cur is not None and ln.startswith("Arguments: "):
            args[cur] = ln[len("Arguments: "):]
        elif cur is not None and re.match(r"^Keys \[\d+\]: ", ln):
            agg_keys[cur] = ln.split(": ", 1)[1]
    def top_level_groups(s: str) -> list[str]:
        depth, start, out = 0, -1, []
        for i, ch in enumerate(s):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    out.append(s[start : i + 1])
        return out

    def is_unpartitioned(arg: str) -> bool:
        groups = top_level_groups(arg)
        # [exprs], [partitionSpec], [orderSpec] → partitioned.
        # Two groups is ambiguous: [exprs], [orderSpec] (unpartitioned,
        # order specs carry ASC/DESC markers) vs [exprs],
        # [partitionSpec] (partitioned, bare columns). One group
        # ([exprs] only) is an unpartitioned unordered global window.
        if len(groups) >= 3:
            return False
        if len(groups) == 2:
            tail = groups[1]
            return " ASC " in tail or " DESC " in tail or \
                tail.endswith(" ASC]") or tail.endswith(" DESC]")
        return True

    bad: list[str] = []
    for i, (num, name, depth) in enumerate(tree):
        if name != "Window":
            continue
        if not is_unpartitioned(args.get(num, "")):
            continue
        limited = False
        for cnum, cname, cdepth in tree[i + 1:]:
            if cdepth <= depth:
                break  # left this node's subtree
            if cname in _LIMIT_NODES:
                limited = True
                break
            if cname in _AGG_NODES and re.fullmatch(
                r"\[_ps_pid#\d+\]", agg_keys.get(cnum, "")
            ):
                # NAMING CONVENTION (not a semantic check, ADVICE r11):
                # `_ps_pid` is reserved repo-wide for the
                # spark_partition_id() projection in grouped_prefix_scan
                # partials — an aggregate grouped by it has at most
                # n_partitions rows. Any operator that names an
                # ORDINARY column _ps_pid would be waved through this
                # gate; don't reuse the name (operators/scan.py owns it).
                limited = True  # ≤ n_partitions rows by construction
                break
        if not limited:
            bad.append(f"Window({num}) over unlimited input")
    return bad


#: Testdata columns with a handful of distinct values (event_type 5,
#: l_returnflag 3, l_linestatus 2, o_orderstatus 3, o_orderpriority 5).
#: A window PARTITION BY drawn only from these over an unbounded fact
#: relation serializes the whole table through that many tasks — the
#: same 100 TB serial-sort killer as an unpartitioned window, one notch
#: removed (r9 VERDICT on q_win_percentiles).
LOW_CARD_COLS = frozenset(
    {"event_type", "l_returnflag", "l_linestatus", "o_orderstatus",
     "o_orderpriority", "source"}
)

_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

#: Per-group row bound: Spark plans a rank-filter (row_number <= k /
#: == k) as WindowGroupLimit, keeping O(k) rows per group before the
#: Window — with a low-card partition that bounds the window input at
#: |groups| x k total rows, which is the sanctioned top-k-per-group
#: shape (q_sample_reservoir, q_docs_tfidf_terms).
_GROUP_LIMIT_NODES = ("WindowGroupLimit",)


def low_cardinality_window_violations(plan: str) -> list[str]:
    """Scan a FORMATTED explain string for Window nodes whose PARTITION
    BY consists ONLY of known low-cardinality columns (:data:`LOW_CARD_
    COLS`) and whose mainline input is unbounded.

    "Mainline input" = the leftmost child chain in the printed tree
    (preorder: a node's first child is the next line; for joins the
    left/streamed side prints first). If that spine hits an aggregate
    or limit node before a scan, the window's input is already reduced
    (per-group rollups, top-k) and the per-key sort is tiny — clean.
    A spine that reaches the scan means the window sorts the raw fact
    table through |distinct values| tasks — flagged.

    Keys whose semantics genuinely require a sequential per-series
    pass (running CUSUM prefix sums, time-range rolling windows over a
    5-series table) document the tradeoff and are allowlisted at the
    test site, not here.

    Returns ``["Window(10) partitioned only by low-card [event_type]",
    ...]`` (empty = clean).
    """
    lines = plan.splitlines()
    tree: list[tuple[int, str, int]] = []  # (num, name, depth)
    for ln in lines:
        m = _TREE_RE.match(ln)
        if m:
            tree.append((int(m.group("num")), m.group("name"),
                         len(m.group("prefix"))))
    args: dict[int, str] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s+(\S+)", ln)
        if m:
            cur = int(m.group(1))
        elif cur is not None and ln.startswith("Arguments: "):
            args[cur] = ln[len("Arguments: "):]

    def top_level_groups(s: str) -> list[str]:
        depth, start, out = 0, -1, []
        for i, ch in enumerate(s):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    out.append(s[start : i + 1])
        return out

    def partition_cols(arg: str) -> set[str] | None:
        """Column names of the partitionSpec, or None if unpartitioned
        (that case belongs to unpartitioned_window_violations)."""
        groups = top_level_groups(arg)
        if len(groups) >= 3:
            spec = groups[1]
        elif len(groups) == 2:
            tail = groups[1]
            ordered = " ASC " in tail or " DESC " in tail or \
                tail.endswith(" ASC]") or tail.endswith(" DESC]")
            if ordered:  # [exprs], [orderSpec] — unpartitioned
                return None
            spec = tail
        else:
            return None
        cols = set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", spec))
        return cols or None

    bad: list[str] = []
    for i, (num, name, depth) in enumerate(tree):
        if name != "Window":
            continue
        cols = partition_cols(args.get(num, ""))
        if cols is None or not cols <= LOW_CARD_COLS:
            continue
        # walk the leftmost child spine to the first bounding node
        bounded = False
        j, d = i, depth
        while j + 1 < len(tree) and tree[j + 1][2] > d:
            j += 1
            d = tree[j][2]
            if (
                tree[j][1] in _LIMIT_NODES
                or tree[j][1] in _AGG_NODES
                or tree[j][1] in _GROUP_LIMIT_NODES
            ):
                bounded = True
                break
        if not bounded:
            bad.append(
                f"Window({num}) partitioned only by low-card "
                f"[{', '.join(sorted(cols))}]"
            )
    return bad


def assert_in_plan(df: DataFrame, *needles: str, absent: tuple[str, ...] = ()) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    for n in absent:
        assert n not in plan, f"did NOT expect {n!r} in plan:\n{plan}"
    return plan
