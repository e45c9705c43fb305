"""Unigram-LM (SentencePiece-family) tokenizer-training query keys.

The BPE trainer's sibling (operators/bpe.py trains by merging;
operators/unigram.py trains by hard-EM over a seeded piece vocabulary
— module docstring there has the full model definition and the
bit-exactness argument: Viterbi DP in IEEE multiply/divide/compare
only, no adds to FMA-fuse, no transcendentals).

Three keys pin the full train loop end-to-end, mirroring the BPE key
family (q_bpe_pairs / q_bpe_merges / q_bpe_segment):

- ``q_unigram_lm_seed``  — the seeded piece vocabulary (stage 1).
- ``q_unigram_lm_em``    — piece counts + probabilities after EM
  rounds 1 and 2 (the first two M-steps, each from a full Viterbi
  E-step over the word relation).
- ``q_unigram_segment``  — the round-2 Viterbi segmentations of the
  corpus vocabulary, with their (bit-deterministic) path scores.
- ``q_unigram_encode_docs`` — the trained tokenizer's per-document
  token budget (the q_bpe_encode_docs mirror).

The oracle mirrors the DP with one generated CTE per character
position per round (the ``_bpe_round_ctes`` device scaled up): both
engines run the SAME multiply chain in the same association order and
pick winners with the SAME lexicographic struct-min, so the doubles
hash bit-equal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators import unigram as UG
from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

_W = UG.MAX_WORD_LEN
_P = UG.MAX_PIECE_LEN
_K = UG.SEED_K_MULTI
_SEED_TOP = 50
_EM_TOP = 25
_SEG_TOP = 50


def _base_ctes() -> str:
    """bags -> word-frequency -> substring-edge -> seed CTEs (shared
    prefix of all three oracles)."""
    return f"""bags AS MATERIALIZED (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS MATERIALIZED (
  SELECT t.tok AS word, CAST(count(*) AS BIGINT) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+') AND len(t.tok) <= {_W}
  GROUP BY 1
),
subs AS MATERIALIZED (
  SELECT word, n, i - 1 AS src, i + l - 1 AS dst,
         word[i : i + l - 1] AS piece
  FROM wf, unnest(generate_series(1, len(word))) AS s(i),
       unnest(generate_series(1, {_P})) AS t(l)
  WHERE i + l - 1 <= len(word)
),
sc AS MATERIALIZED (
  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM subs GROUP BY 1
),
seed AS MATERIALIZED (
  SELECT piece, cnt FROM sc WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM sc WHERE len(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {_K}
  )
)"""


def _round_ctes(r: int, prev_pieces: str) -> str:
    """One hard-EM round as SQL: probabilities from ``prev_pieces``
    (piece, cnt), the Viterbi DP as one CTE per character position
    (min of struct(ns, k, seg) — ns is the NEGATED probability
    product, so struct-min is probability-max with (fewer pieces,
    segmentation ASC) tie-break), the segmentation join-back, and the
    M-step piece counts."""
    parts = [
        f"""pieces{r} AS MATERIALIZED (
  SELECT piece, CAST(cnt AS DOUBLE) /
         (SELECT CAST(sum(cnt) AS DOUBLE) FROM {prev_pieces}) AS p
  FROM {prev_pieces}
)""",
        f"""edges{r} AS MATERIALIZED (
  SELECT s.word AS word, s.src AS src, s.dst AS dst,
         s.piece AS piece, v.p AS p
  FROM subs s JOIN pieces{r} v USING (piece)
)""",
        f"""dp{r}_0 AS MATERIALIZED (
  SELECT word, 0 AS pos, CAST(-1.0 AS DOUBLE) AS ns, 0 AS k, '' AS seg
  FROM wf
)""",
    ]
    for j in range(1, _W + 1):
        lo = max(0, j - _P)
        frontier = "\n      UNION ALL ".join(
            f"SELECT word, pos, ns, k, seg FROM dp{r}_{i}"
            for i in range(lo, j)
        )
        parts.append(f"""dp{r}_{j} AS MATERIALIZED (
  SELECT word, {j} AS pos, best.ns AS ns, best.k AS k, best.seg AS seg
  FROM (
    SELECT a.word AS word,
           min(struct_pack(
               ns := a.ns * e.p,
               k := a.k + 1,
               seg := CASE WHEN a.pos = 0 THEN e.piece
                           ELSE a.seg || ' ' || e.piece END)) AS best
    FROM ({frontier}) a
    JOIN edges{r} e
      ON e.word = a.word AND e.src = a.pos AND e.dst = {j}
    GROUP BY a.word
  )
)""")
    union = "\n    UNION ALL ".join(
        f"SELECT word, pos, ns, k, seg FROM dp{r}_{j}"
        for j in range(1, _W + 1)
    )
    parts.append(f"""seg{r} AS MATERIALIZED (
  SELECT wf.word AS word, wf.n AS n, d.k AS k, d.seg AS seg, d.ns AS ns
  FROM wf JOIN (
    {union}
  ) d ON d.word = wf.word AND d.pos = len(wf.word)
)""")
    parts.append(f"""pc{r} AS MATERIALIZED (
  SELECT t.piece AS piece, CAST(sum(n) AS BIGINT) AS cnt
  FROM seg{r}, unnest(string_split(seg, ' ')) AS t(piece)
  GROUP BY 1
)""")
    return ",\n".join(parts)


_SEED_SQL = f"""
WITH {_base_ctes()}
SELECT piece, CAST(len(piece) AS BIGINT) AS piece_len, cnt,
       CAST(cnt AS DOUBLE) /
       (SELECT CAST(sum(cnt) AS DOUBLE) FROM seed) AS prob
FROM seed
ORDER BY cnt DESC, piece LIMIT {_SEED_TOP}
"""

_EM_SQL = f"""
WITH {_base_ctes()},
{_round_ctes(1, "seed")},
{_round_ctes(2, "pc1")}
SELECT CAST(1 AS BIGINT) AS em_round, piece, cnt,
       CAST(cnt AS DOUBLE) /
       (SELECT CAST(sum(cnt) AS DOUBLE) FROM pc1) AS prob
FROM (SELECT piece, cnt FROM pc1 ORDER BY cnt DESC, piece LIMIT {_EM_TOP})
UNION ALL
SELECT CAST(2 AS BIGINT), piece, cnt,
       CAST(cnt AS DOUBLE) /
       (SELECT CAST(sum(cnt) AS DOUBLE) FROM pc2) AS prob
FROM (SELECT piece, cnt FROM pc2 ORDER BY cnt DESC, piece LIMIT {_EM_TOP})
"""

_SEG_SQL = f"""
WITH {_base_ctes()},
{_round_ctes(1, "seed")},
{_round_ctes(2, "pc1")}
SELECT word, n, CAST(k AS BIGINT) AS n_pieces, seg AS segmented,
       -ns AS score
FROM seg2
ORDER BY n DESC, word LIMIT {_SEG_TOP}
"""


_ENC_SQL = f"""
WITH {_base_ctes()},
{_round_ctes(1, "seed")},
{_round_ctes(2, "pc1")},
occ AS (
  SELECT doc_id, t.tok AS word
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+') AND len(t.tok) <= {_W}
)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(o.word)) AS BIGINT) AS n_chars,
       CAST(sum(s.k) AS BIGINT) AS n_unigram_tokens,
       CAST(sum(length(o.word)) AS DOUBLE) / sum(s.k) AS compression
FROM occ o JOIN seg2 s ON s.word = o.word
GROUP BY o.doc_id
"""


@query("q_unigram_lm_seed", oracle=_SEED_SQL)
def q_unigram_lm_seed(spark, sf_dir):
    """Unigram-LM trainer stage 1 — the seeded piece vocabulary: every
    substring (length 1..{P}) of every trainable word, occurrence-
    weighted; ALL single chars kept (coverage guarantee) + the
    top-{K} multi-char pieces by (count DESC, piece ASC). Emits the
    top-{TOP} seed pieces with their counts and normalized
    probabilities (one exact int->double cast + one IEEE divide —
    bit-equal across engines).

    Scale shape: the substring explode runs over the VOCABULARY-sized
    word-frequency relation (the one corpus-sized pass is the word
    count), the count is a piece-keyed partial-aggregated shuffle, and
    both the multi-char top-k and the output top-k plan as
    TakeOrderedAndProject. See operators/unigram.py for the full
    trainer posture.""".format(P=_P, K=_K, TOP=_SEED_TOP)
    d = load_table(spark, sf_dir, "documents")
    wf = UG.word_freqs_plain(d, TX.bag_tokens("text"), _W)
    seed = UG.with_probs(UG.seed_pieces(UG.substrings(wf, _P), _K))
    return (
        seed.select(
            "piece",
            F.length("piece").cast("bigint").alias("piece_len"),
            "cnt",
            F.col("p").alias("prob"),
        )
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(_SEED_TOP)
    )


@query("q_unigram_lm_em", oracle=_EM_SQL)
def q_unigram_lm_em(spark, sf_dir):
    """The unigram-LM trainer's first two hard-EM rounds, pinned
    bit-exactly: each round Viterbi-segments every trainable word
    under the current piece probabilities (DP over character
    positions — probability-max with (fewer pieces, segmentation ASC)
    tie-break) and re-estimates probabilities from the occurrence-
    weighted piece counts of those segmentations, pruning pieces that
    earned no mass. Emits the top-{TOP} pieces of each round with
    count and probability.

    Determinism: the DP score is a pure IEEE multiply chain in fixed
    association order, compared exactly — both engines compute
    bit-identical candidate sets and pick identical winners (see
    operators/unigram.py for why hard-EM is the exactness-compatible
    EM variant). Counts are exact integers; each probability is one
    divide.

    Scale shape: per round, the piece relation BROADCASTS into the
    vocab-sized substring-edge join, each word's edge list collects in
    one word-keyed shuffle, and the whole DP runs inside a single
    codegen'd higher-order expression per word (operators/unigram.py
    viterbi_segment — two vocab-sized shuffles per E-step, no
    per-layer joins); the M-step count is one piece-keyed shuffle.
    Nothing after the initial word count touches the corpus.""".format(
        TOP=_EM_TOP
    )
    d = load_table(spark, sf_dir, "documents")
    wf = UG.word_freqs_plain(d, TX.bag_tokens("text"), _W)
    rounds, _seg = UG.unigram_train(wf, 2, _K, _W, _P)
    out = None
    for r in (1, 2):
        leg = (
            rounds[r]
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(_EM_TOP)
            .select(
                F.lit(r).cast("bigint").alias("em_round"),
                "piece",
                "cnt",
                F.col("p").alias("prob"),
            )
        )
        out = leg if out is None else out.unionAll(leg)
    return out


@query("q_unigram_segment", oracle=_SEG_SQL)
def q_unigram_segment(spark, sf_dir):
    """The trained unigram tokenizer APPLIED (the q_bpe_segment
    mirror): every trainable corpus word with its round-2 Viterbi
    segmentation — word, occurrence count, piece count, space-joined
    segmentation, and the segmentation's probability-product score
    (bit-deterministic: the DP's own multiply chain, negated out of
    the struct-min ordering key). Top-{TOP} words by (count DESC,
    word ASC). Together with q_unigram_lm_em this pins the full
    train-then-encode loop, exactly as q_bpe_merges + q_bpe_segment
    pin BPE's.

    Scale shape: identical to q_unigram_lm_em (the segmentation IS
    round 2's E-step relation); the top-k is TakeOrderedAndProject
    over the vocabulary.""".format(TOP=_SEG_TOP)
    d = load_table(spark, sf_dir, "documents")
    wf = UG.word_freqs_plain(d, TX.bag_tokens("text"), _W)
    _rounds, seg = UG.unigram_train(wf, 2, _K, _W, _P)
    return (
        seg.select(
            "word",
            "n",
            F.col("k").cast("bigint").alias("n_pieces"),
            F.col("seg").alias("segmented"),
            (-F.col("ns")).alias("score"),
        )
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(_SEG_TOP)
    )


@query("q_unigram_encode_docs", oracle=_ENC_SQL)
def q_unigram_encode_docs(spark, sf_dir):
    """The trained unigram tokenizer's per-document budget (the
    q_bpe_encode_docs mirror, completing the 4-key family symmetry
    with BPE): for every doc, its trainable word count, character
    count, unigram token count under the round-2 Viterbi
    segmentations, and the chars-per-token compression ratio — the
    tokens-per-document planning artifact a sequence packer consumes
    (q_pack_sequences packs token budgets, not char budgets).
    Occurrence-weighted: each word occurrence costs its
    segmentation's piece count.

    Determinism: integer counts joined through the word relation
    (every trainable occurrence matches exactly one segmented word);
    the single double division per row has identical association on
    both engines.

    Scale shape: the segmented vocabulary (vocab-sized) BROADCASTS
    into the per-occurrence join — the corpus-sized relation never
    shuffles on the word key; per-doc aggregation is the only
    corpus-sized shuffle, keyed on doc_id. The EM training upstream
    is q_unigram_lm_em's plan verbatim."""
    d = load_table(spark, sf_dir, "documents")
    wf = UG.word_freqs_plain(d, TX.bag_tokens("text"), _W)
    _rounds, seg = UG.unigram_train(wf, 2, _K, _W, _P)
    occ = d.select(
        "doc_id", F.explode(TX.bag_tokens("text")).alias("word")
    ).filter(
        F.col("word").rlike("^[a-z0-9]+$") & (F.length("word") <= _W)
    )
    return (
        occ.join(F.broadcast(seg.select("word", "k")), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("k").cast("bigint").alias("n_unigram_tokens"),
            (
                F.sum(F.length("word")).cast("double") / F.sum("k")
            ).alias("compression"),
        )
    )


def _tokenizer_compare_oracle() -> str:
    from hive_similarity_join_spark.queries.hygiene_q import (
        _BPE_ROUNDS,
        _bpe_round_ctes,
    )

    bpe_rounds = ",".join(
        _bpe_round_ctes(r, p="zz") for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
WITH {_base_ctes()},
{_round_ctes(1, "seed")},
{_round_ctes(2, "pc1")},
zzw1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{bpe_rounds},
bseg AS (
  SELECT replace(w, '|', '') AS word,
         len(string_split(trim(w, '|'), '||')) AS n_sym
  FROM zzw{_BPE_ROUNDS + 1}
),
occ AS (
  SELECT d.source, t.tok AS word
  FROM documents d, unnest({TX.duck_bag()}) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+') AND len(t.tok) <= {_W}
)
SELECT o.source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(o.word)) AS BIGINT) AS n_chars,
       CAST(sum(b.n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(u.k) AS BIGINT) AS n_unigram_tokens,
       CAST(sum(b.n_sym) AS DOUBLE) / count(*) AS bpe_fertility,
       CAST(sum(u.k) AS DOUBLE) / count(*) AS unigram_fertility,
       CAST(sum(length(o.word)) AS DOUBLE) / sum(b.n_sym)
           AS bpe_compression,
       CAST(sum(length(o.word)) AS DOUBLE) / sum(u.k)
           AS unigram_compression,
       CAST(sum(u.k) AS DOUBLE) / sum(b.n_sym) AS token_ratio
FROM occ o JOIN bseg b USING (word) JOIN seg2 u USING (word)
GROUP BY o.source
"""


@query("q_tokenizer_compare", oracle=_tokenizer_compare_oracle())
def q_tokenizer_compare(spark, sf_dir):
    """Tokenizer-family bake-off, per source: the SAME trainable word
    relation (regex-gated, length-capped) trains BOTH production
    tokenizer families — BPE (operators/bpe.py, merge-based) and
    unigram-LM (operators/unigram.py, hard-EM) — and this key reports
    what each costs on each corpus slice: occurrence-weighted fertility
    (tokens per word), compression (chars per token), and the
    unigram/BPE token-count ratio. This is the selection report a
    training-data platform reads before standardizing a tokenizer:
    fertility drives context-window budget (and therefore
    q_pack_sequences' packing), and a per-source spread in token_ratio
    flags slices where the two families diverge (e.g. templated
    sources that BPE merges collapse but seed substrings don't).

    Exactness: both segmented vocabularies assign every trainable word
    an exact integer piece count (single-char coverage on the unigram
    side, replace-based merges on the BPE side), counts sum exactly,
    and every reported rate is ONE int/int double division. The oracle
    composes both trainers' already-verified CTE pipelines over a
    SHARED wf relation (the BPE leg's CTEs namespaced zz* — its pc{{r}}
    names collide with the unigram E-step's).

    Scale shape: both trainers run on the vocabulary-sized wf sketch;
    the only corpus-sized passes are the initial word count and the
    per-occurrence stats join, where BOTH segmented vocabularies
    broadcast. At 100 TB this is two tokenizer trainings + one corpus
    map — the comparison is practically free next to either training."""
    from hive_similarity_join_spark.operators import bpe
    from hive_similarity_join_spark.operators.cache import pin
    from hive_similarity_join_spark.queries.hygiene_q import _BPE_ROUNDS

    d = load_table(spark, sf_dir, "documents")
    wf = pin(UG.word_freqs_plain(d, TX.bag_tokens("text"), _W))
    _rounds, useg = UG.unigram_train(wf, 2, _K, _W, _P)
    bfinal = bpe.bpe_apply_rounds_lazy(
        wf.select(bpe.encode_chars("word").alias("w"), "n"), _BPE_ROUNDS
    )
    bseg = bfinal.select(
        F.replace(F.col("w"), F.lit("|"), F.lit("")).alias("word"),
        F.size(bpe.decode_symbols("w")).alias("n_sym"),
    )
    occ = d.select(
        "source", F.explode(TX.bag_tokens("text")).alias("word")
    ).filter(
        F.col("word").rlike("^[a-z0-9]+$") & (F.length("word") <= _W)
    )
    return (
        occ.join(F.broadcast(bseg), "word")
        .join(F.broadcast(useg.select("word", "k")), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum("k").cast("bigint").alias("n_unigram_tokens"),
            (F.sum("n_sym").cast("double") / F.count(F.lit(1))).alias(
                "bpe_fertility"
            ),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias(
                "unigram_fertility"
            ),
            (
                F.sum(F.length("word")).cast("double") / F.sum("n_sym")
            ).alias("bpe_compression"),
            (F.sum(F.length("word")).cast("double") / F.sum("k")).alias(
                "unigram_compression"
            ),
            (F.sum("k").cast("double") / F.sum("n_sym")).alias(
                "token_ratio"
            ),
        )
    )
