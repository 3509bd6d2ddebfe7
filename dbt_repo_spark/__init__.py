"""dbt_repo_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference repo (arundahiya94/dbt-repo: dbt models on BigQuery + PySpark
ingestion on Dataproc) as an idiomatic Spark engine:

- ``session``    — SparkSession factory (UTC, AQE, tuned shuffle defaults).
- ``functions``  — BigQuery-dialect shims expressed as Catalyst expressions
                   (timestamp_trunc, safe_divide, generate_date_array, ...).
- ``sources``    — batch readers (JSON dir scan, CSV glob, parquet tables)
                   and a layered catalog (raw | stg | analytics).
- ``plans``      — the model runner: DAG of DataFrame-building model
                   functions, materializations (ephemeral/view/table/
                   incremental), and declarative data tests.
- ``operators``  — relational helpers plus LLM-data-pipeline operators
                   (dedup exact/minhash/simhash/ngram-jaccard, embedding
                   similarity search, text analysis, multimodal columns).
- ``streaming``  — Structured Streaming ingestion (watermark + dedup +
                   stream-static broadcast enrich + partitioned sink).
- ``models``     — the reference's 15+4 dbt models re-expressed as
                   DataFrame builders over the engine.

Everything is built on public PySpark 4.x APIs only; execution is delegated
to Catalyst/Tungsten (declarative DataFrame plans, no hand-scheduling).
"""

from dbt_repo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
