"""Distributed WordPiece tokenizer training + greedy inference.

The THIRD production tokenizer family next to BPE (operators/bpe.py)
and the unigram LM (operators/unigram.py). WordPiece (Schuster &
Nakajima, ICASSP 2012 "Japanese and Korean voice search"; the BERT
tokenizer, Devlin et al. 2019) is BPE's likelihood-scored sibling:

- **Training** runs the same iterated merge loop as BPE, but the
  round's winner maximizes ``score(a, b) = count(ab) / (count(a) *
  count(b))`` — the language-model likelihood GAIN of fusing the pair
  under a unigram model — instead of the raw pair count. Frequent
  pairs of individually-rare symbols win over pairs of ubiquitous
  symbols (the classic example: BPE merges ``e``+``s`` early because
  both are everywhere; WordPiece prefers pairs whose parts rarely
  occur apart).
- **Inference** is NOT merge-replay: a trained WordPiece tokenizer
  segments each word greedily, longest-match-first, against the piece
  inventory, emitting ``##``-prefixed continuation pieces and
  collapsing the whole word to ``[UNK]`` when it hits a position no
  inventory piece matches (HuggingFace ``WordpieceTokenizer``
  semantics).

Representation is shared with the BPE trainer (one ``|s1||s2|...``
encoded string per word, merge application = one codegen'd
``replace`` — see operators/bpe.py's module docstring for why that
is the scale-friendly encoding), and the greedy decoder shares the
substring-edge machinery with the unigram Viterbi (operators/
unigram.py substrings): the piece inventory BROADCASTS into the edge
join, each word's edge list is collected in ONE word-keyed shuffle,
and the whole greedy walk runs inside a single codegen'd
higher-order expression per word (``F.aggregate`` over positions —
same device as ``viterbi_segment``, minus the DP: greedy = argmax
edge length at each position, a pure integer/string computation
with NO floating point anywhere on the inference path).

Bit-exactness: training's only float is the per-round score — ONE
int->double cast per operand, one IEEE multiply, one IEEE divide
(``cnt / (na * nb)``), no add anywhere, so no FMA shape for either
engine to fuse and the winner comparison sees bit-identical doubles
(same argument as the unigram module's multiply-only DP). At this
corpus scale the count products stay far below 2^53 so the double
products are exact; a 100 TB deployment would compare the
cross-multiplied integers ``cnt1*na2*nb2 <=> cnt2*na1*nb1`` in
DECIMAL(38) instead — same winner, no doubles at all.

Scale shape (the 100 TB posture, inherited from the BPE trainer):
the single corpus-sized pass is the initial word count; every round
after runs on the vocabulary-sized word-frequency relation — one
partial-aggregated pair-count shuffle + one symbol-count shuffle per
round, a broadcast 1-row winner, and a codegen'd replace. Greedy
inference is two vocab-sized shuffles total (edge collect + the
final ordering), with the corpus-sized application being a plain
broadcast join of the word->segmentation table into the token
stream (exactly how q_bpe_encode_docs / q_unigram_encode_docs
apply their trained models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.bpe import (
    apply_merge,
    decode_symbols,
    pair_counts,
)
from hive_similarity_join_spark.operators.unigram import substrings

#: Defaults shared with the oracle-SQL generator in queries/wordpiece_q.py.
N_ROUNDS = 6
MAX_WORD_LEN = 12
MAX_PIECE_LEN = 8


def symbol_counts(words: DataFrame) -> DataFrame:
    """(s, cnt): occurrence-weighted symbol counts over the encoded
    word-frequency relation — the ``count(a)`` / ``count(b)`` terms of
    the WordPiece score. One partial-aggregated shuffle keyed by
    symbol (alphabet-then-vocabulary sized)."""
    t = words.withColumn("sy", decode_symbols("w")).select(
        "n", F.explode("sy").alias("s")
    )
    return t.groupBy("s").agg(F.sum("n").cast("bigint").alias("cnt"))


def best_scored_pair(words: DataFrame) -> DataFrame:
    """1-row relation: the round's merge — (a, b, cnt, na, nb, score)
    maximizing ``score = cnt / (na * nb)``, ties broken by (a, b)
    ascending. Plans as two broadcast-able symbol-count joins into the
    pair-count relation and a TakeOrderedAndProject."""
    pc = pair_counts(words)
    sc = symbol_counts(words)
    na = sc.select(F.col("s").alias("a"), F.col("cnt").alias("na"))
    nb = sc.select(F.col("s").alias("b"), F.col("cnt").alias("nb"))
    scored = (
        pc.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "cnt",
            "na",
            "nb",
            (
                F.col("cnt").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("score"),
        )
    )
    return scored.orderBy(
        F.desc("score"), F.asc("a"), F.asc("b")
    ).limit(1)


def wordpiece_merge_rounds(
    words: DataFrame, n_rounds: int = N_ROUNDS
) -> tuple[list[DataFrame], DataFrame]:
    """(per-round 1-row scored-merge relations, final words) with NO
    driver collect — round r+1's words derive from round r's broadcast
    winner (the ``bpe_merge_rounds_lazy`` shape with the likelihood
    score). Unlike the BPE chain, each round references ``words``
    THREE times (pair counts, symbol counts, apply), so the fully-lazy
    form's plan grows 3^rounds — measured: the 6-round lazy chain
    spends minutes inside plan-string generation before a single task
    runs, and cache pins do NOT help (InMemoryRelation stringifies its
    child plan, so the TEXT still nests 3^rounds). Each round's words
    and winner are therefore ``localCheckpoint(eager=True)``-ed — the
    ``bpe_train`` lineage-cut device: one bounded vocab-sized
    materialization per round, round-local plans, and still nothing
    collected to the driver."""
    bests, words_by_round = wordpiece_merge_rounds_trace(words, n_rounds)
    return bests, words_by_round[-1]


def wordpiece_merge_rounds_trace(
    words: DataFrame, n_rounds: int = N_ROUNDS
) -> tuple[list[DataFrame], list[DataFrame]]:
    """``wordpiece_merge_rounds`` keeping EVERY round's vocabulary:
    (per-round 1-row winners, [words after 0..n_rounds merges]) — the
    r16 sharing seam: each round is checkpointed anyway, so holding the
    intermediate references costs nothing, and the rounds sweep's
    snapshots are exactly prefixes of this chain."""
    bests = []
    words = words.localCheckpoint(eager=True)
    words_by_round = [words]
    for _ in range(n_rounds):
        best = best_scored_pair(words).localCheckpoint(eager=True)
        bests.append(best)
        words = apply_merge(words, best).localCheckpoint(eager=True)
        words_by_round.append(words)
    return bests, words_by_round


def piece_inventory(final_words: DataFrame) -> DataFrame:
    """(piece): the trained tokenizer's piece inventory — the distinct
    symbols of the post-training encoded words. Alphabet + surviving
    merged symbols; at most vocabulary-sized, in practice tiny."""
    return (
        final_words.select(
            F.explode(decode_symbols("w")).alias("piece")
        )
        .distinct()
    )


#: Accumulator element type of the per-word greedy walk.
_WALK_STATE = "struct<pos:int,k:int,seg:string,bad:boolean>"


def greedy_segment(
    words_plain: DataFrame,
    pieces: DataFrame,
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(word, n, k, seg, bad): greedy longest-match-first WordPiece
    segmentation of each word under ``pieces`` — ``seg`` space-joins
    the pieces with ``##`` prefixed to every non-initial piece; ``bad``
    marks words where some position had no matching piece (the caller
    renders those as ``[UNK]`` with k=1, the HuggingFace convention —
    possible because greedy can deviate from the training
    segmentation and strand itself mid-word).

    Plan shape: the piece inventory broadcasts into the substring-edge
    join (edges capped at ``max_piece_len``: a longer inventory piece
    simply never matches — the oracle applies the same cap), each
    word's edge list is collected in one word-keyed shuffle, and the
    walk runs as ``max_word_len`` steps of a codegen'd higher-order
    expression: at each step take the longest edge out of the current
    position (``array_max`` on (dst, src, piece) structs = argmax
    dst; the substring at a fixed (src, dst) is unique so there are
    no ties), append its display form, jump. Integer/string only —
    no floats, so cross-engine bit-equality is structural."""
    edges = substrings(words_plain, max_piece_len).join(
        F.broadcast(pieces.select("piece")), "piece"
    )
    es_rel = edges.groupBy("word").agg(
        F.collect_list(F.struct("dst", "src", "piece")).alias("es")
    )

    def step(acc, _j):
        e = F.array_max(
            F.filter(F.col("es"), lambda x: x["src"] == acc["pos"])
        )
        done = (acc["pos"] >= F.length("word")) | acc["bad"]
        disp = F.when(acc["pos"] == 0, e["piece"]).otherwise(
            F.concat(acc["seg"], F.lit(" ##"), e["piece"])
        )
        stuck = F.struct(
            acc["pos"].alias("pos"),
            acc["k"].alias("k"),
            acc["seg"].alias("seg"),
            F.lit(True).alias("bad"),
        )
        advance = F.struct(
            e["dst"].alias("pos"),
            (acc["k"] + 1).alias("k"),
            disp.alias("seg"),
            F.lit(False).alias("bad"),
        )
        return F.when(done, acc).otherwise(
            F.when(e.isNull(), stuck).otherwise(advance)
        )

    init = F.expr(
        f"CAST(named_struct('pos', 0, 'k', 0, 'seg', '', 'bad', false)"
        f" AS {_WALK_STATE})"
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), init, step
    )
    return words_plain.join(es_rel, "word", "left").select(
        "word",
        "n",
        walk["k"].alias("k"),
        walk["seg"].alias("seg"),
        walk["bad"].alias("bad"),
    )
