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
