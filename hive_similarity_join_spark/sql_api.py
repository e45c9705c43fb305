"""E2 entry point: the SQL surface.

The Hive reference exposes its operators as HiveQL + ``CREATE TEMPORARY
FUNCTION`` Java UDFs (``ADD JAR`` etc.). Here the equivalents are:

- temp views with the same table names the DuckDB oracle sees
  (``register_views``), so queries run verbatim via ``spark.sql``;
- **SQL scalar functions** (Spark 4 ``CREATE TEMPORARY FUNCTION …
  RETURN <expr>``) for the measure/tokenizer surface — these inline
  into Catalyst plans and stay inside whole-stage codegen, unlike
  ``spark.udf.register`` Python UDFs which would put a Python worker in
  every row's path.

After ``register_all(spark, sf_dir)``:

    SELECT jaccard(tokenize_text(a.text), tokenize_text(b.text))
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id

is a pure-JVM plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hive_similarity_join_spark.sources.loader import register_views

SQL_FUNCTIONS: dict[str, str] = {
    "tokenize_text": """
        CREATE OR REPLACE TEMPORARY FUNCTION tokenize_text(s STRING)
        RETURNS ARRAY<STRING>
        RETURN array_distinct(filter(split(lower(s), '\\\\s+'), t -> t != ''))
    """,
    "jaccard": """
        CREATE OR REPLACE TEMPORARY FUNCTION jaccard(
            a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN CAST(size(array_intersect(a, b)) AS DOUBLE)
               / size(array_union(a, b))
    """,
    "overlap_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION overlap_sim(
            a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN CAST(size(array_intersect(a, b)) AS DOUBLE)
    """,
    "dice_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION dice_sim(
            a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN 2.0 * size(array_intersect(a, b)) / (size(a) + size(b))
    """,
    "cosine_set_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_set_sim(
            a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN size(array_intersect(a, b)) / sqrt(CAST(size(a) AS DOUBLE) * size(b))
    """,
    "vec_dot": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE),
                         (acc, x) -> acc + x)
    """,
    "vec_cosine": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_cosine(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE),
                         (acc, x) -> acc + x)
               / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
                  * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y),
                                   CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))
    """,
    "doc_fingerprint": """
        CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(s STRING)
        RETURNS STRING
        RETURN md5(CAST(array_join(array_sort(
            array_distinct(filter(split(lower(s), '\\\\s+'), t -> t != ''))), ' ')
            AS BINARY))
    """,
    # asymmetric containment |a ∩ b| / |a| (q_simjoin_containment's
    # verify expression, exposed for verbatim SQL)
    "containment_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION containment_sim(
            a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN CAST(size(array_intersect(a, b)) AS DOUBLE) / size(a)
    """,
    # SQ8 scalar quantization codes (q_vec_quantize's transform):
    # integral-valued doubles in [-127, 127], floor(x*scale + 0.5).
    # Zero/empty vectors return NULL (scale undefined — mirrors the
    # operator path's amax > 0 exclusion; unguarded this was
    # 127/0 = Inf then 0*Inf = NaN codes). The scale is hoisted via a
    # transform over a singleton array so it evaluates ONCE, not per
    # element — SQL-function bodies get no CSE, so referencing the
    # array_max expression inside the per-element lambda would be the
    # O(dim^2) trap word_ngrams' docstring documents (ADVICE r5).
    "sq8_quantize": """
        CREATE OR REPLACE TEMPORARY FUNCTION sq8_quantize(v ARRAY<DOUBLE>)
        RETURNS ARRAY<DOUBLE>
        RETURN CASE WHEN array_max(transform(v, y -> abs(y))) > 0 THEN
            element_at(transform(
                array(CAST(127.0 AS DOUBLE)
                      / array_max(transform(v, y -> abs(y)))),
                s -> transform(v, x -> greatest(CAST(-127.0 AS DOUBLE),
                         least(CAST(127.0 AS DOUBLE),
                               CAST(floor(x * s + 0.5) AS DOUBLE))))), 1)
        END
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(SQL_FUNCTIONS)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Views + SQL functions + UDTF/UDAF: the full E2 surface in one
    call (scalar measures stay pure-Catalyst; tokenize_rows /
    harmonic_mean are the Python table/aggregate extensions,
    functions/udx.py)."""
    from hive_similarity_join_spark.functions.udx import register_udx

    register_views(spark, sf_dir)
    register_sql_functions(spark)
    register_udx(spark)
