"""E2 surface tests: SQL functions inline into JVM plans and agree with
the DataFrame-side operators."""

from __future__ import annotations

import pytest

from hive_similarity_join_spark.operators.similarity import similarity_join
from hive_similarity_join_spark.plans.inspect import explain_str
from hive_similarity_join_spark.sql_api import register_all
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark, SF_SMOKE)


def test_sql_jaccard_matches_kernel(spark):
    sql = spark.sql("""
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               jaccard(tokenize_text(a.text), tokenize_text(b.text)) AS sim
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 30 AND b.doc_id < 30
          AND jaccard(tokenize_text(a.text), tokenize_text(b.text)) >= 0.8
    """)
    docs = spark.table("documents").filter("doc_id < 30")
    kern = similarity_join(docs, "doc_id", "text", threshold=0.8)
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, kern.collect()))


def test_sql_functions_stay_jvm_side(spark):
    df = spark.sql(
        "SELECT vec_cosine(CAST(embedding AS ARRAY<DOUBLE>), "
        "CAST(embedding AS ARRAY<DOUBLE>)) AS c FROM embeddings"
    )
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    vals = [r.c for r in df.limit(20).collect()]
    assert all(abs(v - 1.0) < 1e-12 for v in vals)


def test_sql_fingerprint_agrees_with_column_fn(spark):
    from pyspark.sql import functions as F

    from hive_similarity_join_spark.functions.text import fingerprint

    got = spark.sql("SELECT doc_id, doc_fingerprint(text) AS fp FROM documents")
    want = spark.table("documents").select(
        "doc_id", fingerprint("text").alias("fp")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_sql_containment_and_sq8_agree_with_operators(spark):
    """The new SQL scalar functions mirror the operator expressions:
    containment_sim equals the containment kernel's verify, and
    sq8_quantize reproduces q_vec_quantize's codes."""
    from hive_similarity_join_spark.sql_api import register_all
    from tests.conftest import SF_SMOKE

    register_all(spark, SF_SMOKE)
    row = spark.sql("""
        SELECT containment_sim(tokenize_text('a b c d'),
                               tokenize_text('a b c x y z')) AS c
    """).collect()[0]
    assert row.c == 0.75
    got = spark.sql("""
        SELECT vec_id, sq8_quantize(CAST(embedding AS ARRAY<DOUBLE>)) AS q
        FROM embeddings ORDER BY vec_id LIMIT 5
    """).collect()
    from hive_similarity_join_spark.queries.vectors_q import _sq8

    want = {r.vec_id: list(r._qv) for r in _sq8(spark, SF_SMOKE).collect()}
    for r in got:
        assert list(r.q) == want[r.vec_id]
    # Zero/empty vectors: scale is undefined -> NULL, mirroring the
    # operator path's amax > 0 exclusion (ADVICE r5: unguarded this
    # returned NaN codes from 127/0 = Inf).
    z = spark.sql("""
        SELECT sq8_quantize(array(0.0D, 0.0D)) AS z,
               sq8_quantize(CAST(array() AS ARRAY<DOUBLE>)) AS e
    """).collect()[0]
    assert z.z is None and z.e is None
