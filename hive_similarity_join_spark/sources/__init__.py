from hive_similarity_join_spark.sources.loader import (
    TABLES,
    SCHEMAS,
    load_table,
    load_all,
    register_views,
)

__all__ = ["TABLES", "SCHEMAS", "load_table", "load_all", "register_views"]
