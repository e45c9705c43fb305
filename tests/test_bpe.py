"""BPE trainer: equivalence with the single-node reference algorithm
(Sennrich et al., ACL 2016 — get_stats / merge_word semantics), plus
the lazy 3-round form used by the q_bpe_merges key."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators import bpe
from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def _ref_merge_word(w: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(w):
        if i < len(w) - 1 and (w[i], w[i + 1]) == pair:
            out.append(w[i] + w[i + 1])
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference trainer: overlap-inclusive pair counts, greedy
    left-to-right merge, (count DESC, left, right) tie-break."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                stats[(w[i], w[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], stats[best]))
        # distinct input words stay distinct after a merge (equal
        # strings transform equally), so plain reassignment is safe
        words = {_ref_merge_word(w, best): c for w, c in words.items()}
    segmented = {"".join(w): list(w) for w in words}
    return merges, segmented


def _toy_counts():
    return {
        "low": 5, "lower": 2, "lowest": 1, "newer": 6, "new": 3,
        "wider": 2, "widest": 1, "aaa": 4, "aaaa": 2, "banana": 3,
    }


def test_trainer_matches_reference_on_toy_corpus(spark):
    counts = _toy_counts()
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"), F.col("n").cast("bigint").alias("n")
    )
    got_merges, got_words = bpe.bpe_train(wf, 12, checkpoint_every=5)
    want_merges, want_seg = _ref_bpe(counts, 12)
    assert got_merges == want_merges
    got_seg = {
        "".join(r.sy): list(r.sy)
        for r in got_words.select(bpe.decode_symbols("w").alias("sy")).collect()
    }
    assert got_seg == want_seg


def test_overlap_semantics_aaa():
    """Counting is overlap-inclusive; application is non-overlapping:
    'aaaa'x1 counts (a,a)=3 but merges to [aa, aa]."""
    merges, seg = _ref_bpe({"aaaa": 1}, 1)
    assert merges == [("a", "a", 3)]
    assert seg == {"aaaa": ["aa", "aa"]}


def test_spark_replace_is_greedy_nonoverlapping(spark):
    """The |a||b| string-replace trick must equal the reference greedy
    scan on the nasty overlap cases."""
    cases = {"aaa": 1, "aaaa": 1, "aaaaa": 1, "ababa": 1, "bbab": 1}
    rows = [Row(word=w, n=c) for w, c in cases.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"), F.col("n").cast("bigint").alias("n")
    )
    best = spark.createDataFrame([Row(a="a", b="a", cnt=1)])
    got = {
        "".join(r.sy): list(r.sy)
        for r in bpe.apply_merge(wf, best)
        .select(bpe.decode_symbols("w").alias("sy"))
        .collect()
    }
    want = {
        w: list(_ref_merge_word(tuple(w), ("a", "a"))) for w in cases
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
def test_trainer_matches_reference_on_random_corpora(spark, counts):
    """Property check: random small corpora over a tiny alphabet (rich
    in overlaps and ties) must train identically to the reference.
    max_examples kept low — each example is several Spark jobs."""
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, got_words = bpe.bpe_train(wf, 6)
    want_merges, want_seg = _ref_bpe(counts, 6)
    assert got_merges == want_merges, counts
    got_seg = {
        "".join(r.sy): list(r.sy)
        for r in got_words.select(bpe.decode_symbols("w").alias("sy")).collect()
    }
    assert got_seg == want_seg, counts


def test_delta_trainer_matches_full_recount_on_toy_corpus(spark):
    """The incremental pair-count trainer must produce EXACTLY the
    merges and final segmentation of the full-recount trainer (the
    delta is the full recount's difference by construction)."""
    counts = _toy_counts()
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, got_words = bpe.bpe_train_delta(wf, 12, checkpoint_every=5)
    want_merges, want_seg = _ref_bpe(counts, 12)
    assert got_merges == want_merges
    got_seg = {
        "".join(r.sy): list(r.sy)
        for r in got_words.select(bpe.decode_symbols("w").alias("sy")).collect()
    }
    assert got_seg == want_seg


@settings(max_examples=4, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
def test_delta_trainer_matches_reference_on_random_corpora(spark, counts):
    """Property check for the delta trainer on overlap/tie-rich tiny
    corpora — exhaustion (no pairs left) and tie-breaks must match the
    reference exactly, like the full-recount trainer."""
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, _ = bpe.bpe_train_delta(wf, 6)
    want_merges, _ = _ref_bpe(counts, 6)
    assert got_merges == want_merges, counts


def test_lazy_rounds_match_iterated_trainer(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(200)
    wf = bpe.word_freqs(d, TX.bag_tokens("text"))
    merges, _ = bpe.bpe_train(wf, 3)
    lazy = [
        (r.a, r.b, int(r.cnt))
        for best in bpe.bpe_merge_rounds_lazy(wf, 3)
        for r in best.collect()
    ]
    assert lazy == merges


def test_batched_trainer_matches_reference_on_toy_corpus(spark):
    """The batched trainer (top-m prefix acceptance) must produce
    EXACTLY the reference merges and segmentation — the acceptance
    rules are a proof obligation, this is its check on a tie/overlap
    rich corpus."""
    counts = _toy_counts()
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, got_words = bpe.bpe_train_batched(
        wf, 12, batch_m=6, checkpoint_every=5
    )
    want_merges, want_seg = _ref_bpe(counts, 12)
    assert got_merges == want_merges
    got_seg = {
        "".join(r.sy): list(r.sy)
        for r in got_words.select(bpe.decode_symbols("w").alias("sy")).collect()
    }
    assert got_seg == want_seg


def test_batched_trainer_batches_non_adjacent_pairs(spark):
    """The multi-merge-per-round equivalence case (VERDICT r10 item 6):
    a corpus whose top pairs are symbol-DISJOINT (non-adjacent) — the
    batch rules must accept several per round and still match the
    sequential reference exactly. Word boundaries isolate each pair, so
    no merge creates a pair that could outrank a later candidate."""
    counts = {"xy": 9, "pq": 8, "mn": 7, "uv": 6, "xz": 2, "pz": 1}
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, _ = bpe.bpe_train_batched(wf, 4, batch_m=4)
    want_merges, _ = _ref_bpe(counts, 4)
    assert got_merges == want_merges
    # the four top pairs share no symbol and create nothing that can
    # win (each word IS the pair): all four must land in one batch
    assert [m[:2] for m in got_merges] == [
        ("x", "y"), ("p", "q"), ("m", "n"), ("u", "v")
    ]


@settings(max_examples=6, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
def test_batched_trainer_matches_reference_on_random_corpora(spark, counts):
    """Property check: overlap/tie/collision-rich tiny corpora (the
    'ab' alphabet maximizes created-symbol aliasing, e.g. merged 'ab'
    vs merged 'a'+'b' strings) — the batched trainer must degrade to
    smaller batches rather than ever diverge from the reference."""
    rows = [Row(word=w, n=c) for w, c in counts.items()]
    wf = spark.createDataFrame(rows).select(
        bpe.encode_chars("word").alias("w"),
        F.col("n").cast("bigint").alias("n"),
    )
    got_merges, _ = bpe.bpe_train_batched(wf, 6, batch_m=4)
    want_merges, _ = _ref_bpe(counts, 6)
    assert got_merges == want_merges, counts
