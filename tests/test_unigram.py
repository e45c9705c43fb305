"""Unigram-LM trainer: equivalence with the single-node reference
algorithm (hard-EM / Viterbi-EM — operators/unigram.py docstring has
the model definition), checked EXACTLY, floats included: the reference
runs the same IEEE multiply/divide/compare chain in Python (whose
floats are IEEE doubles), so scores must match bit-for-bit, not
approximately."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators import unigram as UG
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE

W, P, K = UG.MAX_WORD_LEN, UG.MAX_PIECE_LEN, UG.SEED_K_MULTI


def _ref_word_freqs(texts: list[str]) -> dict[str, int]:
    cnt: Counter = Counter()
    for t in texts:
        for tok in re.split(r"\s+", t.lower()):
            if tok and re.fullmatch(r"[a-z0-9]+", tok) and len(tok) <= W:
                cnt[tok] += 1
    return dict(cnt)


def _ref_seed(words: dict[str, int]) -> dict[str, int]:
    cnt: Counter = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(1, P + 1):
                if i + l <= len(w):
                    cnt[w[i : i + l]] += n
    seed = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:K]
    seed.update(dict(multi))
    return seed


def _ref_probs(counts: dict[str, int]) -> dict[str, tuple[int, float]]:
    t = float(sum(counts.values()))
    return {p: (c, float(c) / t) for p, c in counts.items()}


def _ref_viterbi(
    words: dict[str, int], probs: dict[str, tuple[int, float]]
) -> dict[str, tuple[float, int, str]]:
    """word -> (ns, k, seg): min-struct DP, same tuple ordering the
    engines use (ns ASC = prob DESC, then k ASC, then seg ASC)."""
    out = {}
    for w in words:
        dp: list[tuple[float, int, str] | None] = [(-1.0, 0, "")] + [
            None
        ] * len(w)
        for j in range(1, len(w) + 1):
            best = None
            for l in range(1, min(P, j) + 1):
                i = j - l
                s = w[i:j]
                if s in probs and dp[i] is not None:
                    prev = dp[i]
                    cand = (
                        prev[0] * probs[s][1],
                        prev[1] + 1,
                        s if i == 0 else prev[2] + " " + s,
                    )
                    if best is None or cand < best:
                        best = cand
            dp[j] = best
        assert dp[len(w)] is not None
        out[w] = dp[len(w)]
    return out


def _ref_train(words: dict[str, int], rounds: int):
    piece_rounds = [_ref_probs(_ref_seed(words))]
    seg = None
    for _ in range(rounds):
        seg = _ref_viterbi(words, piece_rounds[-1])
        cnt: Counter = Counter()
        for w, n in words.items():
            for p in seg[w][2].split(" "):
                cnt[p] += n
        piece_rounds.append(_ref_probs(dict(cnt)))
    return piece_rounds, seg


def _texts() -> list[str]:
    return (
        pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["text"])[
            "text"
        ].tolist()
    )


def _spark_wf(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    return UG.word_freqs_plain(d, TX.bag_tokens("text"), W)


def test_word_freqs_match_reference(spark):
    got = {r.word: r.n for r in _spark_wf(spark).collect()}
    assert got == _ref_word_freqs(_texts())


def test_seed_pieces_and_probs_match_reference(spark):
    wf = _spark_wf(spark)
    got = {
        r.piece: (r.cnt, r.p)
        for r in UG.with_probs(
            UG.seed_pieces(UG.substrings(wf, P), K)
        ).collect()
    }
    ref = _ref_probs(_ref_seed(_ref_word_freqs(_texts())))
    assert got == ref  # exact, probabilities bit-included


def test_em_rounds_and_segmentation_match_reference(spark):
    """Two full hard-EM rounds: per-round piece counts AND
    probabilities match the reference exactly, and the final E-step's
    segmentations (including the float path scores) are bit-equal."""
    wf = _spark_wf(spark)
    rounds, seg = UG.unigram_train(wf, 2, K, W, P)
    ref_rounds, ref_seg = _ref_train(_ref_word_freqs(_texts()), 2)
    for r in (1, 2):
        got = {r_.piece: (r_.cnt, r_.p) for r_ in rounds[r].collect()}
        assert got == ref_rounds[r], f"EM round {r} diverged"
    got_seg = {r.word: (r.ns, r.k, r.seg, r.n) for r in seg.collect()}
    ref_wf = _ref_word_freqs(_texts())
    assert got_seg == {
        w: (v[0], v[1], v[2], ref_wf[w]) for w, v in ref_seg.items()
    }


def test_round2_pieces_are_pruned_subset(spark):
    """The M-step prunes: round-2 pieces are exactly the pieces used by
    round-1 segmentations — a subset of the seed, and every word keeps
    a segmentation path (the final position is always reachable)."""
    wf = _spark_wf(spark)
    rounds, seg = UG.unigram_train(wf, 2, K, W, P)
    seed = {r.piece for r in rounds[0].collect()}
    r2 = {r.piece for r in rounds[1].collect()}
    assert r2 <= seed and len(r2) < len(seed)
    n_words = wf.count()
    assert seg.filter(F.col("seg").isNotNull()).count() == n_words


def test_viterbi_prefers_probable_pieces():
    """Planted check (no corpus): with one dominant multi-char piece,
    Viterbi picks it; tie-break prefers fewer pieces then ASC string."""
    words = {"abab": 1}
    probs = {"ab": (8, 0.5), "a": (2, 0.125), "b": (2, 0.125), "ba": (4, 0.25)}
    seg = _ref_viterbi(words, probs)
    assert seg["abab"][2] == "ab ab"
    assert seg["abab"][0] == -(0.5 * 0.5)


def _ref_nbest(
    words: dict[str, int], probs: dict[str, tuple[int, float]], nb: int
) -> dict[str, list[tuple[float, int, str]]]:
    """word -> sorted n-best list of (ns, k, seg): per position keep
    the nb lexicographically-least structs — the reference for
    viterbi_nbest_segment, same tuple ordering as the engines."""
    out = {}
    for w in words:
        dp: list[list[tuple[float, int, str]]] = [[(-1.0, 0, "")]] + [
            [] for _ in w
        ]
        for j in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(P, j) + 1):
                i = j - l
                s = w[i:j]
                if s in probs and dp[i]:
                    for prev in dp[i]:
                        cands.append(
                            (
                                prev[0] * probs[s][1],
                                prev[1] + 1,
                                s if i == 0 else prev[2] + " " + s,
                            )
                        )
            dp[j] = sorted(cands)[:nb]
        assert dp[len(w)]
        out[w] = dp[len(w)]
    return out


def test_nbest_matches_reference_and_rank1_is_viterbi(spark):
    """viterbi_nbest_segment vs the single-node reference, EXACT
    (float scores bit-included): per word the full (rank -> (ns, k,
    seg)) list and nb_eff match, and the rank-1 row is bit-identical
    to the 1-best DP's winner — the invariant that makes sampled
    encodes degrade to deterministic encodes at alpha->0, nb=1."""
    NB = 3
    wf = _spark_wf(spark)
    rounds, _seg = UG.unigram_train(wf, 1, K, W, P)
    got_rows = UG.viterbi_nbest_segment(wf, rounds[1], NB, P).collect()
    got: dict[str, dict[int, tuple[float, int, str]]] = {}
    nb_eff: dict[str, int] = {}
    for r in got_rows:
        got.setdefault(r.word, {})[r.rank] = (r.ns, r.k, r.seg)
        nb_eff[r.word] = r.nb_eff
    ref_words = _ref_word_freqs(_texts())
    ref_rounds, _ = _ref_train(ref_words, 1)
    ref = _ref_nbest(ref_words, ref_rounds[1], NB)
    assert set(got) == set(ref)
    for w, lst in ref.items():
        assert nb_eff[w] == len(lst)
        assert got[w] == {i + 1: v for i, v in enumerate(lst)}
    ref_v = _ref_viterbi(ref_words, ref_rounds[1])
    for w, v in ref_v.items():
        assert got[w][1] == v


def test_nbest_planted_ties_and_degenerate_words(spark):
    """Planted edge cases run through the REAL Spark DP (not just the
    reference): a word whose two segmentations have BIT-EQUAL scores
    (p(aa) = p(a)^2 exactly in binary floats) must rank them by the
    (k ASC, seg ASC) tie-break; a single-char word has nb_eff=1; and
    rank-1 always equals the 1-best DP's winner."""
    from pyspark.sql import Row

    words = spark.createDataFrame(
        [Row(word="aa", n=3), Row(word="a", n=2), Row(word="abab", n=1)]
    )
    # cnt values chosen so T=16 and each p is an exact binary fraction:
    # p(a)=8/16=0.5, p(aa)=4/16=0.25=p(a)*p(a) bit-exactly -> a true tie
    pieces_rows = [
        Row(piece="a", cnt=8), Row(piece="aa", cnt=4),
        Row(piece="b", cnt=2), Row(piece="ab", cnt=2),
    ]
    probs = {r.piece: (r.cnt, r.cnt / 16.0) for r in pieces_rows}
    pieces = UG.with_probs(spark.createDataFrame(pieces_rows))
    got = {}
    nb_eff = {}
    for r in UG.viterbi_nbest_segment(words, pieces, 3, P).collect():
        got.setdefault(r.word, {})[r.rank] = (r.ns, r.k, r.seg)
        nb_eff[r.word] = r.nb_eff
    # single-char word: one path only
    assert nb_eff["a"] == 1 and got["a"][1] == (-0.5, 1, "a")
    # the tie: identical ns, k breaks it — [aa] before [a a]
    assert nb_eff["aa"] == 2
    assert got["aa"][1] == (-0.25, 1, "aa")
    assert got["aa"][2] == (-0.25, 2, "a a")
    # full agreement with the single-node reference on all three words
    ref = _ref_nbest({r.word: r.n for r in words.collect()}, probs, 3)
    for w, lst in ref.items():
        assert got[w] == {i + 1: v for i, v in enumerate(lst)}
        assert nb_eff[w] == len(lst)
