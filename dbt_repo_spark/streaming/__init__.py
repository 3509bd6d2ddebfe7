from dbt_repo_spark.streaming.ingest import (
    GBFS_STATUS_SCHEMA,
    parse_status_stream,
    start_status_ingest,
)

__all__ = ["GBFS_STATUS_SCHEMA", "parse_status_stream", "start_status_ingest"]
