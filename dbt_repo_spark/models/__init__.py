from dbt_repo_spark.models.gbfs import GBFS_MODELS
from dbt_repo_spark.models.demo import DEMO_MODELS

ALL_MODELS = GBFS_MODELS + DEMO_MODELS

__all__ = ["ALL_MODELS", "GBFS_MODELS", "DEMO_MODELS"]
