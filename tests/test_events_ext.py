"""Brute-force semantic pins for the round-8 event-stream extensions.

The oracle gate proves Spark == DuckDB on the SAME formulation; these
tests pin the formulation itself against a trivially-correct sequential
reference: the CUSUM closed form vs the textbook recursion, grid
gap-fill vs a per-type dictionary sweep, and attribution vs an
imperative journey replay — so a shared logic error in both mirrors
cannot hide.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

from hive_similarity_join_spark.registry import QUERIES, load_registry
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE

load_registry()


def _events(spark):
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect()
    )
    return sorted(
        (r for r in rows if r.ts is not None),
        key=lambda r: (r.ts, r.event_id),
    )


def test_cusum_matches_textbook_recursion(spark):
    got = {
        r.event_type: r for r in QUERIES["q_events_cusum"](spark, SF_SMOKE).collect()
    }
    ev = _events(spark)
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        xs = [Fraction(Decimal(str(round(r.value, 6)))) for r in rows]
        n = len(xs)
        mu = sum(xs) / n
        s_pos = s_neg = Fraction(0)
        best_pos = best_neg = Fraction(0)
        best_ts = None
        for r, x in zip(rows, xs):
            s_pos = max(Fraction(0), s_pos + (x - mu))
            s_neg = max(Fraction(0), s_neg - (x - mu))
            if best_ts is None or s_pos > best_pos:
                best_pos, best_ts = s_pos, r.ts
            best_neg = max(best_neg, s_neg)
        g = got[et]
        assert g.n == n
        assert abs(g.cusum_pos - float(best_pos)) < 5e-7, et
        assert abs(g.cusum_neg - float(best_neg)) < 5e-7, et
        assert g.changepoint_ts == best_ts.strftime("%Y-%m-%d %H:%M:%S"), et


def test_gapfill_matches_dict_sweep(spark):
    got = QUERIES["q_time_gapfill"](spark, SF_SMOKE).collect()
    ev = _events(spark)
    slots: dict[str, dict[int, list]] = {}
    for r in ev:
        s = int(r.ts.timestamp()) // 900 * 900
        slots.setdefault(r.event_type, {}).setdefault(s, []).append(r.value)
    expect = {}
    for et, m in slots.items():
        lo, hi = min(m), max(m)
        carry = None
        for s in range(lo, hi + 900, 900):
            vs = m.get(s)
            if vs is not None:
                carry = sum(Decimal(str(round(v, 6))) for v in vs)
            expect[(et, s)] = (len(vs) if vs else 0, 0 if vs else 1, float(carry))
    assert len(got) == len(expect)
    from datetime import datetime, timezone

    for r in got:
        s = int(
            datetime.strptime(r.slot_start, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
        cnt, gap, filled = expect[(r.event_type, s)]
        assert (r.cnt, r.gap_filled) == (cnt, gap), (r.event_type, r.slot_start)
        assert r.filled_sum == filled, (r.event_type, r.slot_start)


def test_attribution_matches_journey_replay(spark):
    got = {
        (r.model, r.touch_type): (r.n_conversions, r.revenue)
        for r in QUERIES["q_events_attribution"](spark, SF_SMOKE).collect()
    }
    ev = _events(spark)
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    first: dict[str, list] = {}
    last: dict[str, list] = {}
    for rows in by_user.values():
        journey: list = []
        for r in rows:
            if r.event_type == "purchase":
                ft = journey[0].event_type if journey else "direct"
                lt = journey[-1].event_type if journey else "direct"
                x = Decimal(str(round(r.value, 6)))
                first.setdefault(ft, []).append(x)
                last.setdefault(lt, []).append(x)
                journey = []
            else:
                journey.append(r)
    expect = {
        ("first_touch", t): (len(v), float(sum(v))) for t, v in first.items()
    } | {("last_touch", t): (len(v), float(sum(v))) for t, v in last.items()}
    assert got == expect
    # conservation: both models credit every purchase exactly once
    n_purchases = sum(1 for r in ev if r.event_type == "purchase")
    for model in ("first_touch", "last_touch"):
        assert (
            sum(n for (m, _), (n, _) in got.items() if m == model) == n_purchases
        )


def test_funnel_matches_sequential_replay(spark):
    """q_events_funnel vs an imperative per-user replay: a user
    converts step N only if the step's FIRST qualifying event is
    strictly after their step N-1 conversion time — a purchase before
    any click must not count (the ordered-chain property the three
    independent counts would get wrong)."""
    rows = _events(spark)
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_all = len(by_user)
    n_v = n_c = n_p = 0
    for evs in by_user.values():
        t0 = next((r.ts for r in evs if r.event_type == "view"), None)
        if t0 is None:
            continue
        n_v += 1
        t1 = next(
            (r.ts for r in evs if r.event_type == "click" and r.ts > t0), None
        )
        if t1 is None:
            continue
        n_c += 1
        t2 = next(
            (r.ts for r in evs if r.event_type == "purchase" and r.ts > t1),
            None,
        )
        if t2 is not None:
            n_p += 1
    got = {
        r.step_name: r for r in QUERIES["q_events_funnel"](spark, SF_SMOKE).collect()
    }
    assert got["all_users"].users == n_all
    assert got["view"].users == n_v
    assert got["click_after_view"].users == n_c
    assert got["purchase_after_click"].users == n_p
    assert got["view"].conv_from_prev == n_v / n_all
    assert got["purchase_after_click"].conv_from_start == n_p / n_all


def test_retention_matches_cohort_replay(spark):
    """q_events_retention vs a dictionary sweep: cohort = first active
    ISO week; a user counts ONCE per (cohort, offset) no matter how
    many events they fired that week; every cohort has offset 0 with
    retention exactly 1.0 only when all cohort members were active in
    week 0 (they are, by definition of first activity)."""
    import datetime

    rows = _events(spark)

    def week(ts):
        d = ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        return monday

    first: dict = {}
    weeks: dict = {}
    for r in rows:
        w = week(r.ts)
        u = r.user_id
        weeks.setdefault(u, set()).add(w)
        if u not in first or w < first[u]:
            first[u] = w
    grid: dict = {}
    for u, ws in weeks.items():
        c0 = first[u]
        for w in ws:
            off = (w - c0).days // 7
            grid.setdefault((c0, off), set()).add(u)
    sizes: dict = {}
    for u, c0 in first.items():
        sizes[c0] = sizes.get(c0, 0) + 1
    got = QUERIES["q_events_retention"](spark, SF_SMOKE).collect()
    assert len(got) == len(grid)
    for r in got:
        c0 = datetime.datetime.strptime(
            r.cohort_week, "%Y-%m-%d %H:%M:%S"
        ).date()
        key = (c0, r.offset_w)
        assert r.active_users == len(grid[key]), key
        assert r.cohort_size == sizes[c0], key
        if r.offset_w == 0:
            assert r.retention == 1.0
