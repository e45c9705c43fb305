"""Search/corpus-hygiene key properties (oracle exactness is covered by
tools/selfcheck.py; these pin the structural invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.search_q import (
    _BM25_TOPK,
    _DECON_MOD,
)
from hive_similarity_join_spark.registry import QUERIES, load_registry
from tests.conftest import SF_SMOKE

load_registry()


def test_decontaminate_never_flags_eval_docs(spark):
    out = QUERIES["q_decontaminate"](spark, SF_SMOKE)
    assert out.filter(F.col("doc_id") % _DECON_MOD == 0).count() == 0
    assert out.filter(F.col("n_shared_ngrams") <= 0).count() == 0


def test_bm25_topk_shape(spark):
    rows = QUERIES["q_search_bm25"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= _BM25_TOPK
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)
        assert a.score >= b.score


def test_inverted_index_postings_bounded_and_sorted(spark):
    rows = QUERIES["q_text_inverted_index"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.sample_postings.split(",") if x]
        assert len(ids) <= 5
        assert ids == sorted(ids)
        assert r.n_docs >= len(ids)
        assert r.total_tf >= r.n_docs


def test_chunks_cover_all_tokens_with_overlap(spark):
    from hive_similarity_join_spark.queries.search_q import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    rows = QUERIES["q_docs_to_chunks"](spark, SF_SMOKE).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # chunk at start s holds min(SIZE, doclen - s) tokens, where
        # doclen falls out of the LAST chunk (its start + its length)
        doclen = (len(chunks) - 1) * _CHUNK_STRIDE + chunks[-1].n_tokens
        for c in chunks:
            start = c.chunk_id * _CHUNK_STRIDE
            assert c.n_tokens == min(_CHUNK_SIZE, doclen - start)
            assert len(c.chunk_text.split(" ")) == c.n_tokens
        # starts cover the whole doc: one chunk per stride window
        assert len(chunks) == (doclen - 1) // _CHUNK_STRIDE + 1


def test_decontamination_matches_brute_force_on_random_corpora(spark):
    """Property test: the broadcast-join screening equals a pure-Python
    n-gram-overlap model — flagged docs share >= 1 eval shingle with the
    exact shared-count, unflagged docs share none. Randomized corpora
    cover short docs (< n tokens), duplicate docs, and eval/train
    boundary cases the fixed fixture can't enumerate."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hive_similarity_join_spark.streaming.incremental_decontaminate import (
        eval_shingles,
        screen_batch,
    )

    N = 3
    alphabet = ["a", "b", "c", "d"]
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(alphabet), min_size=0, max_size=8),
        min_size=2,
        max_size=10,
    )

    def model(docs):
        grams = [
            {" ".join(d[i : i + N]) for i in range(len(d) - N + 1)}
            for d in docs
        ]
        ev = set().union(*(g for i, g in enumerate(grams) if i % 3 == 0), set())
        return {
            i: len(g & ev)
            for i, g in enumerate(grams)
            if i % 3 != 0 and g & ev
        }

    @given(corpus_strategy)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(docs):
        rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ev = df.filter(F.col("doc_id") % 3 == 0)
        train = df.filter(F.col("doc_id") % 3 != 0)
        _, contaminated = screen_batch(
            train, eval_shingles(ev, n=N), n=N
        )
        got = {
            r.doc_id: r.n_shared_ngrams
            for r in contaminated.select("doc_id", "n_shared_ngrams").collect()
        }
        assert got == model(docs)

    check()
