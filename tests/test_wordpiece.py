"""WordPiece operator semantics on planted literals — the paths the
corpus keys can't be guaranteed to exercise (greedy stranding ->
[UNK]) and a hand-computed likelihood-score reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.bpe import encode_chars
from hive_similarity_join_spark.operators.wordpiece import (
    best_scored_pair,
    greedy_segment,
    piece_inventory,
    wordpiece_merge_rounds,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, n bigint")


def _pieces(spark, pieces):
    return spark.createDataFrame([(p,) for p in pieces], "piece string")


def test_likelihood_score_beats_raw_count(spark):
    """Hand-computed reference: symbols a:3 b:2 c:4 d:3; pair (c,d)
    has the larger RAW count (3 vs 2) but (a,b) the larger likelihood
    score (2/(3*2)=0.333 vs 3/(4*3)=0.25) — WordPiece must pick
    (a,b) where BPE would pick (c,d)."""
    w = _words(spark, [("ab", 2), ("cd", 3), ("ac", 1)]).select(
        encode_chars("word").alias("w"), "n"
    )
    row = best_scored_pair(w).collect()[0]
    assert (row.a, row.b, row.cnt, row.na, row.nb) == ("a", "b", 2, 3, 2)
    assert abs(row.score - 2 / 6) < 1e-15


def test_score_tie_breaks_on_pair_ascending(spark):
    """Planted exact tie: (a,b) and (c,d) both score cnt/(na*nb) =
    1/4 — the (a, b)-ascending tie-break must pick (a,b)."""
    w = _words(spark, [("ab", 1), ("cd", 1), ("aw", 1), ("bx", 1),
                       ("cy", 1), ("dz", 1),
                       # pad the tail letters so the mixed pairs score
                       # 1/(2*4) = 0.125, strictly below the tie at 0.25
                       ("w", 3), ("x", 3), ("y", 3), ("z", 3)]).select(
        encode_chars("word").alias("w"), "n"
    )
    row = best_scored_pair(w).collect()[0]
    assert (row.a, row.b) == ("a", "b")
    assert row.score == 0.25


def test_greedy_longest_match_and_continuation_prefix(spark):
    wf = _words(spark, [("abab", 5)])
    seg = greedy_segment(
        wf, _pieces(spark, ["ab", "a", "b"]), 8, 4
    ).collect()[0]
    assert (seg.k, seg.seg, seg.bad) == (2, "ab ##ab", False)


def test_greedy_stranding_marks_bad(spark):
    """Inventory {ab, bc, a} on word 'abc': greedy takes 'ab' (longest
    at 0) and strands at 'c' — the [UNK] path (bad=True), exactly the
    HuggingFace WordpieceTokenizer failure mode."""
    wf = _words(spark, [("abc", 1)])
    seg = greedy_segment(
        wf, _pieces(spark, ["ab", "bc", "a"]), 8, 4
    ).collect()[0]
    assert seg.bad is True


def test_word_with_no_edges_is_bad(spark):
    """A word sharing no substring with the inventory has no edge list
    at all (left-join miss) — must come out bad, not dropped."""
    wf = _words(spark, [("xyz", 1)])
    out = greedy_segment(wf, _pieces(spark, ["ab"]), 8, 4).collect()
    assert len(out) == 1 and out[0].bad is True


def test_merge_rounds_inventory_roundtrip(spark):
    """Two scored rounds on a toy corpus: the final inventory contains
    the merged symbols and every surviving single char; greedy under
    it re-segments the training words without stranding."""
    wf = _words(spark, [("abab", 3), ("cd", 2)])
    enc = wf.select(encode_chars("word").alias("w"), "n")
    bests, final = wordpiece_merge_rounds(enc, 2)
    merged = {r.a + r.b for b in bests for r in b.collect()}
    inv = {r.piece for r in piece_inventory(final).collect()}
    assert merged <= inv | {m for m in merged}
    seg = {
        r.word: (r.k, r.seg, r.bad)
        for r in greedy_segment(wf, piece_inventory(final), 8, 4).collect()
    }
    assert not any(v[2] for v in seg.values())
    assert sum(v[0] for v in seg.values()) < 6  # merges shrank budgets
