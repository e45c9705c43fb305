from hive_similarity_join_spark.plans.inspect import explain_str, assert_in_plan

__all__ = ["explain_str", "assert_in_plan"]
