"""Distributed unigram-LM (SentencePiece-family) tokenizer training.

The second production tokenizer family next to BPE (operators/bpe.py):
where BPE greedily grows a vocabulary by merging, the unigram LM
(Kudo, ACL 2018, "Subword Regularization") starts from a LARGE seed
vocabulary of candidate pieces and iterates EM — segment the corpus
under the current piece probabilities, re-estimate probabilities from
the segmentation, prune pieces that earn no mass.

This implementation is the HARD-EM (Viterbi-EM) variant: the E-step
assigns each word its single best segmentation (argmax of the product
of piece probabilities) instead of expected counts over the full
lattice. Two reasons, both load-bearing:

- **Bit-exactness.** The Viterbi DP uses ONLY IEEE-754 multiply,
  divide and compare — no additions anywhere, so there is no
  multiply-accumulate shape for either engine to fuse (the CLAUDE.md
  FMA rule that bit q_events_outliers), and no transcendental
  (log/exp) whose last-ulp rounding differs between libm and the JVM.
  Multiplication and division are correctly rounded per IEEE-754 on
  both engines, so two engines running the SAME op chain produce
  bit-identical doubles, and the DP's max/tie-break picks identical
  winners. Soft EM's forward-backward needs SUMS of path
  probabilities — exact only in unbounded rationals (the common
  denominator T^len overflows DECIMAL(38) for any realistic T), or
  log-space floats whose cross-engine bit-equality cannot be
  guaranteed.
- **It is the standard scalable approximation**: hard-EM is the
  classic drop-in for EM when expected counts are expensive, and at
  corpus scale the Viterbi path per word IS what the trained
  tokenizer will emit at inference time, so estimating from it is
  self-consistent.

Model definition (all arithmetic mirrored by the DuckDB oracle):

- Words: lowercase ``[a-z0-9]+`` tokens, occurrence-counted into a
  vocabulary-sized word-frequency relation (the same pre-tokenization
  as the BPE trainer); words longer than ``max_word_len`` are excluded
  from training (fixed DP depth both sides).
- Seed vocabulary: every substring of length 1..``max_piece_len`` of
  every word, occurrence-weighted (a substring occurring twice in a
  word counts twice per word occurrence). ALL single characters are
  kept (guarantees every word has a segmentation); multi-character
  pieces keep the top-``k_multi`` by (count DESC, piece ASC).
- Probability: ``p(s) = cnt(s) / T`` with ``T = sum of selected piece
  counts`` — one exact int->double cast and one IEEE divide per piece.
- E-step (Viterbi): best segmentation of word ``w`` maximizes
  ``prod p(s_i)``; ties break on (fewer pieces, then the segmented
  string ascending). Computed as a per-position DP over the word
  relation — see ``viterbi_segment``.
- M-step: ``cnt'(s) =`` occurrence-weighted count of ``s`` in the
  Viterbi segmentations; pieces with zero count are pruned (every
  word keeps a path: its own round-r pieces survive into round r+1);
  ``p'(s) = cnt'(s) / T'``.

Scale shape (the 100 TB posture): the single corpus-sized pass is the
initial word count — everything after runs on the WORD-FREQUENCY
relation (vocabulary-sized, ~10^7 rows at web scale, exactly like the
distributed BPE trainer). Per EM round: the substring/edge relation is
vocab x len x piece_len rows, the piece relation (vocab-of-pieces) is
BROADCAST into the edge join, each word's edge list is collected in
one word-keyed shuffle, the whole Viterbi DP runs inside ONE
codegen'd higher-order expression per word (no joins, no per-layer
shuffles — see viterbi_segment for why the chained-relational
alternative was abandoned), and the M-step count is one piece-keyed
shuffle. Two shuffles per E-step, both vocab-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Defaults shared with the oracle-SQL generator in queries/unigram_q.py.
MAX_WORD_LEN = 10
MAX_PIECE_LEN = 4
SEED_K_MULTI = 60


def word_freqs_plain(
    corpus: DataFrame, tokens_col, max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """(word, n): occurrence-counted ``[a-z0-9]+`` tokens no longer
    than ``max_word_len`` — the relation the trainer iterates on.
    Plain (un-encoded) sibling of bpe.word_freqs."""
    tok = corpus.select(F.explode(tokens_col).alias("word")).filter(
        F.col("word").rlike("^[a-z0-9]+$")
        & (F.length("word") <= max_word_len)
    )
    return tok.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def substrings(
    words: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(word, n, src, dst, piece): every substring occurrence of every
    word, as a DP edge — the piece spans character positions
    ``src+1 .. dst`` (``src`` = 0-based start, ``dst = src + len``).
    Vocab x len x piece_len rows; overlapping occurrences all emitted
    (each is a distinct DP edge and a distinct seed-count unit)."""
    i = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    t = words.select("word", "n", i)
    l = F.explode(
        F.sequence(F.lit(1), F.lit(max_piece_len))
    ).alias("l")
    t = t.select("word", "n", "i", l).filter(
        F.col("i") + F.col("l") - 1 <= F.length("word")
    )
    return t.select(
        "word",
        "n",
        (F.col("i") - 1).alias("src"),
        (F.col("i") + F.col("l") - 1).alias("dst"),
        F.substring(F.col("word"), F.col("i"), F.col("l")).alias("piece"),
    )


def seed_counts(subs: DataFrame) -> DataFrame:
    """(piece, cnt): occurrence-weighted substring counts."""
    return subs.groupBy("piece").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )


def seed_pieces(
    subs: DataFrame, k_multi: int = SEED_K_MULTI
) -> DataFrame:
    """Seed vocabulary: all single characters + the top-``k_multi``
    multi-character substrings by (count DESC, piece ASC). The
    single-char stratum guarantees full coverage; the multi top-k is
    a TakeOrderedAndProject over the piece-count relation."""
    sc = seed_counts(subs)
    chars = sc.filter(F.length("piece") == 1)
    multi = (
        sc.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(k_multi)
    )
    return chars.unionByName(multi)


def with_probs(piece_counts: DataFrame) -> DataFrame:
    """(piece, cnt, p): normalize counts to probabilities with ONE
    int->double cast and ONE IEEE divide per piece — p = cnt / T,
    T = sum(cnt) over the relation (1-row broadcast)."""
    t_rel = piece_counts.agg(F.sum("cnt").cast("bigint").alias("t"))
    return piece_counts.crossJoin(F.broadcast(t_rel)).select(
        "piece",
        "cnt",
        (F.col("cnt").cast("double") / F.col("t").cast("double")).alias("p"),
    )


#: Accumulator element type of the per-row Viterbi DP.
_DP_STATE = "array<struct<ns:double,k:int,seg:string>>"


def viterbi_segment(
    words: DataFrame,
    pieces: DataFrame,
    max_word_len: int = MAX_WORD_LEN,  # noqa: ARG001 — see docstring
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(word, n, k, seg, ns): each word's Viterbi segmentation under
    ``pieces`` (piece, p) — ``seg`` is the space-joined best
    segmentation, ``k`` its piece count, ``ns`` the NEGATED probability
    product (the DP's ordering key, kept for audit: bit-deterministic,
    see module docstring).

    DP semantics (mirrored CTE-for-expression by the oracle):
    ``dp[j] = min over (i, piece) edges ending at j of
    struct(ns=dp[i].ns * p, k=dp[i].k + 1, seg=dp[i].seg + ' ' + piece)``
    with lexicographic struct order (ns ASC = probability DESC, then
    k ASC, then seg ASC).

    Plan shape: the piece relation BROADCASTS into the substring-edge
    join, each word's edge list (≤ len x max_piece_len structs) is
    collected in ONE word-keyed aggregation, and the entire DP then
    runs INSIDE a single codegen'd higher-order expression per word
    (``F.aggregate`` over positions; ``array_min`` is the same
    lexicographic struct-min the oracle's ``min(struct_pack(...))``
    uses, verified to tie-break identically). A first relational cut
    of this operator ran the DP as ``max_word_len`` chained
    join+groupBy layers with localCheckpoint lineage cuts — correct,
    but every cut ran the full Catalyst pipeline on a growing subtree
    (32s of plan compilation per EM pass at ANY data size); the
    per-row form is two shuffles per E-step total and analysis-time
    flat. ``max_word_len`` is enforced by ``word_freqs_plain``; the
    expression iterates to each word's own length.

    Unreachable positions (possible from round 2 on, after pruning:
    only pieces used by round 1's segmentations survive) carry a NULL
    slot, and edges out of a NULL slot are filtered before the min —
    exactly the relational semantics where an unreachable (word, pos)
    simply has no row. Every word's own previous-round path survives
    pruning, so the final position is always reachable."""
    edges = substrings(words, max_piece_len).join(
        F.broadcast(pieces.select("piece", "p")), "piece"
    )
    es_rel = edges.groupBy("word").agg(
        F.collect_list(F.struct("src", "dst", "piece", "p")).alias("es")
    )

    def step(acc, j):
        def from_src(e, field, default):
            return F.when(e["src"] == 0, default).otherwise(
                F.element_at(acc, e["src"])[field]
            )

        cands = F.transform(
            F.filter(
                F.col("es"),
                lambda e: (e["dst"] == j)
                & (
                    (e["src"] == 0)
                    | F.element_at(acc, e["src"]).isNotNull()
                ),
            ),
            lambda e: F.struct(
                (
                    from_src(e, "ns", F.lit(-1.0).cast("double")) * e["p"]
                ).alias("ns"),
                (from_src(e, "k", F.lit(0)) + 1).alias("k"),
                F.when(e["src"] == 0, e["piece"])
                .otherwise(
                    F.concat(
                        F.element_at(acc, e["src"])["seg"],
                        F.lit(" "),
                        e["piece"],
                    )
                )
                .alias("seg"),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.expr(f"CAST(array() AS {_DP_STATE})"),
        step,
    )
    best = F.element_at(dp, F.length("word"))
    return words.join(es_rel, "word").select(
        "word",
        "n",
        best["k"].alias("k"),
        best["seg"].alias("seg"),
        best["ns"].alias("ns"),
    )


#: Accumulator element type of the n-best DP: per position, the sorted
#: list of up to NB best partial-segmentation structs (empty list =
#: unreachable position, the n-best analogue of the 1-best NULL slot).
_NBEST_STATE = "array<array<struct<ns:double,k:int,seg:string>>>"


def viterbi_nbest_segment(
    words: DataFrame,
    pieces: DataFrame,
    nb: int,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(word, n, nb_eff, rank, k, seg, ns): each word's ``nb`` BEST
    segmentations under ``pieces`` (piece, p) — the n-best Viterbi DP
    behind subword regularization (Kudo, ACL 2018 §3: sample among the
    n-best segmentations instead of always emitting the argmax).
    ``rank`` is 1-based (rank 1 = the 1-best path, identical to
    ``viterbi_segment``'s winner), ``nb_eff`` the number of distinct
    segmentations found (< nb for words with fewer paths).

    Same exactness contract as the 1-best DP (module docstring): every
    path score is a pure IEEE multiply chain in fixed association
    order; ranking compares (ns ASC = probability DESC, k ASC, seg
    ASC) — and because a segmentation string uniquely identifies its
    path, the candidate order is TOTAL, so both engines keep identical
    n-best lists at every position. No sums, no transcendentals.

    DP semantics (mirrored by the oracle's per-position row_number
    CTEs): ``dp[j] = the nb lexicographically-least structs over all
    (i, piece) edges ending at j and all structs s in dp[i]`` of
    ``struct(ns=s.ns*p, k=s.k+1, seg=s.seg||' '||piece)``. Plan shape
    is viterbi_segment's verbatim — pieces broadcast into the edge
    join, one word-keyed collect, the whole DP one codegen'd
    higher-order expression per word (candidate lists are ≤
    nb x max_piece_len structs per position; ``array_sort`` + ``slice``
    is the struct-lexicographic top-k) — so the E-step stays two
    vocab-sized shuffles at any corpus size."""
    edges = substrings(words, max_piece_len).join(
        F.broadcast(pieces.select("piece", "p")), "piece"
    )
    es_rel = edges.groupBy("word").agg(
        F.collect_list(F.struct("src", "dst", "piece", "p")).alias("es")
    )

    def step(acc, j):
        def expand(e):
            base = F.array(
                F.struct(
                    (F.lit(-1.0).cast("double") * e["p"]).alias("ns"),
                    F.lit(1).alias("k"),
                    e["piece"].alias("seg"),
                )
            )
            ext = F.transform(
                F.element_at(acc, e["src"]),
                lambda s: F.struct(
                    (s["ns"] * e["p"]).alias("ns"),
                    (s["k"] + 1).alias("k"),
                    F.concat(s["seg"], F.lit(" "), e["piece"]).alias("seg"),
                ),
            )
            return F.when(e["src"] == 0, base).otherwise(ext)

        cands = F.flatten(
            F.transform(
                F.filter(
                    F.col("es"),
                    lambda e: (e["dst"] == j)
                    & (
                        (e["src"] == 0)
                        | (F.size(F.element_at(acc, e["src"])) > 0)
                    ),
                ),
                expand,
            )
        )
        return F.concat(
            acc, F.array(F.slice(F.array_sort(cands), 1, nb))
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.expr(f"CAST(array() AS {_NBEST_STATE})"),
        step,
    )
    best = F.element_at(dp, F.length("word"))
    exploded = words.join(es_rel, "word").select(
        "word",
        "n",
        F.size(best).alias("nb_eff"),
        F.posexplode(best).alias("pos0", "cand"),
    )
    return exploded.select(
        "word",
        "n",
        "nb_eff",
        (F.col("pos0") + 1).alias("rank"),
        F.col("cand")["k"].alias("k"),
        F.col("cand")["seg"].alias("seg"),
        F.col("cand")["ns"].alias("ns"),
    )


def piece_counts(segmented: DataFrame) -> DataFrame:
    """M-step counts: (piece, cnt) occurrence-weighted over the Viterbi
    segmentations — pieces absent from every segmentation drop out
    (the unigram trainer's pruning)."""
    return (
        segmented.select(
            "n", F.explode(F.split("seg", " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def unigram_train(
    words: DataFrame,
    n_rounds: int,
    k_multi: int = SEED_K_MULTI,
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
) -> tuple[list[DataFrame], DataFrame]:
    """The full hard-EM loop, fully lazy: returns (per-round piece
    relations [(piece, cnt, p) — index 0 is the seed, index r the
    round-r M-step re-estimate], the last E-step's segmentation
    relation (word, n, k, seg, ns) — i.e. the Viterbi pass that
    produced the final counts). ``n_rounds`` EM rounds = ``n_rounds``
    Viterbi passes; the returned piece list has ``n_rounds + 1``
    entries."""
    rounds = [with_probs(seed_pieces(substrings(words, max_piece_len), k_multi))]
    seg = None
    for _ in range(n_rounds):
        seg = viterbi_segment(
            words, rounds[-1], max_word_len, max_piece_len
        )
        rounds.append(with_probs(piece_counts(seg)))
    return rounds, seg
