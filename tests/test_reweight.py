"""DoReMi-flavored domain reweighting (operators/reweight.py).

The query key's oracle verifies only the cross-engine arithmetic; these
tests verify the ALGORITHM — exact agreement with a single-node integer
reference implementation, and convergence on a planted two-domain
corpus (VERDICT r11 item 5's done-criterion).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.reweight import (
    ETA,
    KEEP,
    MIX,
    REWEIGHT_ROUNDS,
    SCALE,
    SMOOTH_DEN,
    heldout_oov_loss,
    multiplicative_reweight,
)


def _reference_mw(losses: dict[str, int], rounds: int) -> dict[str, int]:
    """Single-node mirror of multiplicative_reweight in Python ints.
    All quantities are positive, so Python's floor // equals the
    engines' truncating DIV."""
    total = len(losses) * SCALE
    w = {d: SCALE for d in losses}
    for _ in range(rounds):
        u = {d: w[d] * (SCALE + ETA * losses[d]) for d in losses}
        su = sum(u.values())
        w = {
            d: (KEEP * ((u[d] * total) // su) + MIX * SCALE) // SMOOTH_DEN
            for d in losses
        }
    return w


def test_mw_matches_single_node_reference_exactly(spark):
    losses = {"web": 137_500, "code": 12_000, "forums": 482_311}
    loss_df = spark.createDataFrame(
        [(d, 0, 0, l) for d, l in losses.items()],
        "source string, n_heldout_bigrams long, n_oov long, loss_scaled long",
    )
    got = {
        r["source"]: r["weight_scaled"]
        for r in multiplicative_reweight(loss_df).collect()
    }
    assert got == _reference_mw(losses, REWEIGHT_ROUNDS)


def test_mw_mass_and_floor_invariants(spark):
    losses = {"a": 0, "b": SCALE}  # extreme spread
    loss_df = spark.createDataFrame(
        [(d, 0, 0, l) for d, l in losses.items()],
        "source string, n_heldout_bigrams long, n_oov long, loss_scaled long",
    )
    got = {
        r["source"]: r["weight_scaled"]
        for r in multiplicative_reweight(loss_df).collect()
    }
    total = len(losses) * SCALE
    # truncating divisions can only LOSE mass, never create it
    assert sum(got.values()) <= total
    # the MIX/SMOOTH_DEN uniform floor: no domain ever starves
    assert all(w >= MIX * SCALE // SMOOTH_DEN for w in got.values())
    assert got["b"] > got["a"]


def test_converges_on_planted_two_domain_corpus(spark):
    """Two planted domains: 'easy' docs all share one text (held-out
    bigrams always exist in the reference half -> OOV 0), 'hard' docs
    each use doc-unique tokens (held-out bigrams NEVER in the
    reference half -> OOV rate exactly 1). The MW loop must send
    hard's weight up from uniform and easy's down, with hard
    approaching the smoothed fixed point."""
    rows = [(i, "easy", "alpha beta gamma delta epsilon") for i in range(1, 21)]
    rows += [(i, "hard", f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(21, 41)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    loss = heldout_oov_loss(docs)
    lrows = {r["source"]: r for r in loss.collect()}
    assert lrows["easy"]["n_heldout_bigrams"] > 0  # md5 coin split both ways
    assert lrows["easy"]["loss_scaled"] == 0
    assert lrows["hard"]["loss_scaled"] == SCALE  # 100% OOV, exactly
    got = {
        r["source"]: r["weight_scaled"]
        for r in multiplicative_reweight(loss).collect()
    }
    # uniform start is SCALE each; hard must gain, easy must shed
    assert got["hard"] > SCALE > got["easy"]
    # and convergence has actually progressed: with loss spread this
    # extreme the fixed point under 9:1 smoothing puts >80% of the
    # renormalized mass on hard within REWEIGHT_ROUNDS rounds
    assert got["hard"] > 8 * got["easy"]
    # matches the single-node reference bit-for-bit too
    ref = _reference_mw(
        {d: lrows[d]["loss_scaled"] for d in lrows}, REWEIGHT_ROUNDS
    )
    assert got == ref


def test_apply_key_sampler_invariants(spark):
    """q_mixture_reweight_apply on the smoke corpus: the deterministic
    coin must realize rates close to target (binomial at n_docs per
    domain), never select outside [0, n_docs], and the achieved shares
    must partition the resampled corpus."""
    from hive_similarity_join_spark.queries.hygiene_q import (
        q_mixture_reweight_apply,
    )
    from tests.conftest import SF_SMOKE

    rows = q_mixture_reweight_apply(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r["achieved_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_docs"]
        assert 0.0 < r["target_rate"] <= 1.0
        # 4-sigma binomial envelope: sd <= 0.5/sqrt(n_docs)
        sd = 0.5 / (r["n_docs"] ** 0.5)
        assert abs(r["achieved_rate"] - r["target_rate"]) <= 4 * sd + 1e-9


@settings(max_examples=5, deadline=None)
@given(
    losses=st.lists(
        st.integers(min_value=0, max_value=SCALE), min_size=2, max_size=6
    ),
    rounds=st.integers(min_value=1, max_value=7),
)
def test_mw_property_exact_vs_reference(spark, losses, rounds):
    """Property form of the exact-equality test: ANY loss vector (full
    [0, SCALE] range, 2-6 domains) and ANY round count produce weights
    bit-equal to the single-node integer reference — the integer
    arithmetic has no data-dependent branch that could diverge."""
    lm = {f"d{i}": l for i, l in enumerate(losses)}
    loss_df = spark.createDataFrame(
        [(d, 0, 0, l) for d, l in lm.items()],
        "source string, n_heldout_bigrams long, n_oov long, loss_scaled long",
    )
    got = {
        r["source"]: r["weight_scaled"]
        for r in multiplicative_reweight(loss_df, rounds=rounds).collect()
    }
    assert got == _reference_mw(lm, rounds)
