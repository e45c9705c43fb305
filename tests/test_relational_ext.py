"""Brute-force semantic pins for the round-8 relational extensions.

The oracle gate proves Spark == DuckDB on the SAME formulation; these
tests pin the formulation itself against a trivially-correct O(n^2) /
O(n log n) reference, so a shared logic error in both mirrors cannot
hide (e.g. a staircase that misses cross-bucket dominance, or an
island rule that splits touching intervals)."""

from __future__ import annotations

from hive_similarity_join_spark.registry import QUERIES, load_registry
from tests.conftest import SF_SMOKE

load_registry()


def test_skyline_matches_bruteforce_pareto(spark):
    from pyspark.sql import functions as F

    from hive_similarity_join_spark.functions import text as TX
    from hive_similarity_join_spark.sources.loader import load_table

    got = {
        (r.doc_id, r.n_chars, r.n_vocab)
        for r in QUERIES["q_skyline_docs"](spark, SF_SMOKE).collect()
    }
    d = load_table(spark, SF_SMOKE, "documents")
    pts = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.array_distinct(TX.bag_tokens("text")))
        .cast("bigint")
        .alias("y"),
    ).collect()
    sky = set()
    for p in pts:
        dominated = any(
            (q.x > p.x and q.y >= p.y) or (q.x == p.x and q.y > p.y)
            for q in pts
        )
        if not dominated:
            sky.add((p.doc_id, p.x, p.y))
    assert got == sky and len(sky) > 0


def test_intervals_merge_matches_sequential_sweep(spark):
    from pyspark.sql import functions as F

    from hive_similarity_join_spark.sources.loader import load_table

    got = {
        (r.o_custkey, r.island_id, r.start_date, r.end_date, r.n_orders)
        for r in QUERIES["q_intervals_merge"](spark, SF_SMOKE).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    rows = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ms"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
            F.greatest("ms", "o_orderdate").alias("e"),
        )
        .collect()
    )
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append((r.s, r.e, r.o_orderkey))
    want = set()
    for cust, ivs in by_cust.items():
        ivs.sort()
        island, start, end, n = 0, None, None, 0
        for s, e, _ in ivs:
            if start is None or s > end:
                if start is not None:
                    want.add((cust, island, str(start), str(end), n))
                island, start, end, n = island + 1, s, e, 1
            else:
                end, n = max(end, e), n + 1
        want.add((cust, island, str(start), str(end), n))
    assert got == want and len(want) > 0
