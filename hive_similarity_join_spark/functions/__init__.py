from hive_similarity_join_spark.functions import text, vectors

__all__ = ["text", "vectors"]
