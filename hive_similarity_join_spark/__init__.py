"""hive_similarity_join_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-PySpark engine with the query and
data-processing capabilities of the reference `bdevetak/Hive-Similarity-Join`
(a Hive/Hadoop set-similarity-join pipeline; see SURVEY.md — the reference
snapshot at /root/reference is empty, so the surface is reconstructed from
the VCL algorithm family [Vernica, Carey, Li, SIGMOD 2010] and the standard
HiveQL operator surface), extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Everything here is built on public PySpark 4.x APIs only:
DataFrame/SQL + Catalyst, higher-order array functions (UDF-free hot
paths), Structured Streaming, and Arrow-batched Pandas UDFs where Python
is unavoidable.
"""

from hive_similarity_join_spark.session import get_spark
from hive_similarity_join_spark.sources.loader import TABLES, load_table, load_all, register_views
from hive_similarity_join_spark.operators.similarity import similarity_join, tokenize

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_all",
    "register_views",
    "similarity_join",
    "tokenize",
]
