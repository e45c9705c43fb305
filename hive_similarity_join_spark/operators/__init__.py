from hive_similarity_join_spark.operators.similarity import (
    similarity_join,
    naive_similarity_join,
    tokenize,
)

__all__ = ["similarity_join", "naive_similarity_join", "tokenize"]
