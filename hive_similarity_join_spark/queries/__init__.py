"""Importing this package populates the registry (each module
registers its query keys via the ``@query`` decorator)."""

import hive_similarity_join_spark.queries.similarity_q  # noqa: F401
import hive_similarity_join_spark.queries.relational_q  # noqa: F401
import hive_similarity_join_spark.queries.vectors_q  # noqa: F401
import hive_similarity_join_spark.queries.text_q  # noqa: F401
import hive_similarity_join_spark.queries.events_q  # noqa: F401
import hive_similarity_join_spark.queries.dedup_q  # noqa: F401
import hive_similarity_join_spark.queries.multimodal_q  # noqa: F401
import hive_similarity_join_spark.queries.tpch_q  # noqa: F401
import hive_similarity_join_spark.queries.pipeline_q  # noqa: F401
import hive_similarity_join_spark.queries.search_q  # noqa: F401
import hive_similarity_join_spark.queries.hygiene_q  # noqa: F401
import hive_similarity_join_spark.queries.unigram_q  # noqa: F401
import hive_similarity_join_spark.queries.wordpiece_q  # noqa: F401
