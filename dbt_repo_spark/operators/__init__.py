from dbt_repo_spark.operators import dedup, multimodal, relational, similarity, text

__all__ = ["dedup", "multimodal", "relational", "similarity", "text"]
