"""Hypothesis property tests (SURVEY §5.4): the kernel vs a pure-Python
model on randomized corpora — exercises empty token sets, duplicate
docs, single-token docs, and threshold edge cases the fixed fixtures
can't enumerate."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_similarity_join_spark.operators.similarity import similarity_join

ALPHABET = ["a", "b", "c", "d", "e"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=6),
    min_size=2,
    max_size=8,
)


def _model_pairs(docs: list[list[str]], threshold: float, measure: str):
    """Reference implementation: all pairs, exact set measures."""
    sets = [frozenset(d) for d in docs]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            if measure == "jaccard":
                sim = inter / len(a | b)
            elif measure == "dice":
                sim = 2.0 * inter / (len(a) + len(b))
            elif measure == "cosine":
                sim = inter / math.sqrt(len(a) * len(b))
            else:
                sim = float(inter)
            if sim >= threshold:
                out[(i, j)] = sim
    return out


@pytest.mark.parametrize("measure,threshold", [
    ("jaccard", 0.5),
    ("dice", 0.7),
    ("cosine", 0.6),
    ("overlap", 2.0),
])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_kernel_matches_model(spark, measure, threshold, docs):
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2): r.sim
        for r in similarity_join(
            df, "doc_id", "text", threshold=threshold, measure=measure,
            persist=False,
        ).collect()
    }
    want = _model_pairs(docs, threshold, measure)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_threshold_monotonicity(spark, docs):
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lo = {
        (r.id1, r.id2)
        for r in similarity_join(df, "doc_id", "text", 0.4, persist=False).collect()
    }
    hi = {
        (r.id1, r.id2)
        for r in similarity_join(df, "doc_id", "text", 0.8, persist=False).collect()
    }
    assert hi <= lo


def _model_bag_pairs(docs: list[list[str]], threshold: float):
    """Reference: multiset Jaccard = sum min(counts) / sum max(counts)."""
    from collections import Counter

    bags = [Counter(d) for d in docs]
    out = {}
    for i in range(len(bags)):
        for j in range(i + 1, len(bags)):
            a, b = bags[i], bags[j]
            if not a or not b:
                continue
            toks = set(a) | set(b)
            mins = sum(min(a[t], b[t]) for t in toks)
            maxs = sum(max(a[t], b[t]) for t in toks)
            sim = mins / maxs
            if sim >= threshold:
                out[(i, j)] = sim
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_bag_jaccard_expansion_matches_multiset_model(spark, docs):
    """The bag-to-set expansion through the kernel must equal a direct
    multiset-Jaccard model — including repeated tokens, empty docs,
    and exact-duplicate bags."""
    from hive_similarity_join_spark.operators.similarity import bag_jaccard_join

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2): r.sim
        for r in bag_jaccard_join(df, "doc_id", "text", threshold=0.4).collect()
    }
    want = _model_bag_pairs(docs, 0.4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_containment_matches_model(spark, docs):
    """Asymmetric containment (probe-prefix x full index) vs the
    all-ordered-pairs Python model on randomized corpora."""
    from pyspark.sql import Row

    from hive_similarity_join_spark.operators.similarity import containment_join

    t = 0.6
    rows = [Row(id=i, text=" ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows)
    got = {
        (r.id1, r.id2, round(r.sim, 12))
        for r in containment_join(df, "id", "text", threshold=t).collect()
    }
    sets = [frozenset(d) for d in docs]
    want = set()
    for i, a in enumerate(sets):
        if not a:
            continue
        for j, b in enumerate(sets):
            if i == j or not b:
                continue
            sim = len(a & b) / len(a)
            if sim >= t:
                want.add((i, j, round(sim, 12)))
    assert got == want


def _rarity_weights(docs: list[list[str]]):
    """(weights per token, per-doc sets) — w = N_nonempty - df + 1."""
    from collections import Counter

    sets = [frozenset(d) for d in docs]
    nonempty = [s for s in sets if s]
    dfc = Counter(t for s in nonempty for t in s)
    n = len(nonempty)
    return {t: n - c + 1 for t, c in dfc.items()}, sets


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_weighted_containment_matches_model(spark, docs):
    """Weighted containment (suffix-weight prefix + weighted positional
    bound) vs the all-ordered-pairs rarity-weight model."""
    from pyspark.sql import Row

    from hive_similarity_join_spark.operators.similarity import (
        weighted_containment_join,
    )

    t = 0.6
    rows = [Row(id=i, text=" ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows)
    got = {
        (r.id1, r.id2, round(r.sim, 12))
        for r in weighted_containment_join(
            df, "id", "text", threshold=t, persist=False
        ).collect()
    }
    w, sets = _rarity_weights(docs)
    want = set()
    for i, a in enumerate(sets):
        if not a:
            continue
        twa = sum(w[x] for x in a)
        for j, b in enumerate(sets):
            if i == j or not b:
                continue
            sim = sum(w[x] for x in a & b) / twa
            if sim >= t:
                want.add((i, j, round(sim, 12)))
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_weighted_jaccard_matches_model(spark, docs):
    """Weighted symmetric Jaccard (weighted 2t/(1+t) prefix + weighted
    length filter + pair-exact positional bound) vs the (tw, id)-
    oriented all-pairs model — duplicate bags give tw ties, exercising
    the id tie-break."""
    from pyspark.sql import Row

    from hive_similarity_join_spark.operators.similarity import (
        weighted_jaccard_join,
    )

    t = 0.5
    rows = [Row(id=i, text=" ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows)
    got = {
        (r.id1, r.id2, round(r.sim, 12))
        for r in weighted_jaccard_join(
            df, "id", "text", threshold=t, persist=False
        ).collect()
    }
    w, sets = _rarity_weights(docs)
    tw = {i: sum(w[x] for x in s) for i, s in enumerate(sets) if s}
    want = set()
    for i, a in enumerate(sets):
        if not a:
            continue
        for j, b in enumerate(sets):
            if not b or (tw[i], i) >= (tw[j], j):
                continue
            sw = sum(w[x] for x in a & b)
            sim = sw / (tw[i] + tw[j] - sw)
            if sim >= t:
                want.add((i, j, round(sim, 12)))
    assert got == want


two_corpora = st.tuples(
    st.lists(st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=6),
             min_size=1, max_size=6),
    st.lists(st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=6),
             min_size=1, max_size=6),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpora=two_corpora)
def test_containment_rs_matches_model(spark, corpora):
    """R-S containment (batch probes x corpus index, shared dictionary
    over both relations) vs the cross-relation Python model — including
    ids shared between the relations (no id1 != id2 clause)."""
    from pyspark.sql import Row

    from hive_similarity_join_spark.operators.similarity import containment_join

    l_docs, r_docs = corpora
    t = 0.6
    lf = spark.createDataFrame([Row(id=i, text=" ".join(d)) for i, d in enumerate(l_docs)])
    rf = spark.createDataFrame([Row(id=i, text=" ".join(d)) for i, d in enumerate(r_docs)])
    got = {
        (r.id1, r.id2, round(r.sim, 12))
        for r in containment_join(
            lf, "id", "text", threshold=t, other=rf, persist=False
        ).collect()
    }
    ls = {i: frozenset(d) for i, d in enumerate(l_docs) if d}
    rs = {i: frozenset(d) for i, d in enumerate(r_docs) if d}
    want = set()
    for a, sa in ls.items():
        for b, sb in rs.items():
            sim = len(sa & sb) / len(sa)
            if sim >= t:
                want.add((a, b, round(sim, 12)))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpora=two_corpora)
def test_weighted_containment_rs_matches_model(spark, corpora):
    """Weighted R-S containment: ONE global rarity scale over the union
    of both relations, probes screened against the corpus index."""
    from pyspark.sql import Row

    from hive_similarity_join_spark.operators.similarity import (
        weighted_containment_join,
    )

    l_docs, r_docs = corpora
    t = 0.6
    lf = spark.createDataFrame([Row(id=i, text=" ".join(d)) for i, d in enumerate(l_docs)])
    rf = spark.createDataFrame([Row(id=i, text=" ".join(d)) for i, d in enumerate(r_docs)])
    got = {
        (r.id1, r.id2, round(r.sim, 12))
        for r in weighted_containment_join(
            lf, "id", "text", threshold=t, other=rf, persist=False
        ).collect()
    }
    from collections import Counter

    ls = {i: frozenset(d) for i, d in enumerate(l_docs) if d}
    rs = {i: frozenset(d) for i, d in enumerate(r_docs) if d}
    dfc = Counter(tk for s in list(ls.values()) + list(rs.values()) for tk in s)
    n = len(ls) + len(rs)
    w = {tk: n - c + 1 for tk, c in dfc.items()}
    want = set()
    for a, sa in ls.items():
        twa = sum(w[x] for x in sa)
        for b, sb in rs.items():
            sim = sum(w[x] for x in sa & sb) / twa
            if sim >= t:
                want.add((a, b, round(sim, 12)))
    assert got == want
