"""Dense ID assignment (vocabulary indexing) without a global window.

The naive way to number a vocabulary — ``row_number() OVER (ORDER BY
term)`` — collapses the whole table into ONE partition (Exchange
SinglePartition) and dies exactly when the vocab is big enough to matter.
The scalable shape is the classic two-phase rank:

1. range-shuffle the distinct values so partition *i* holds a contiguous,
   sorted slice (``repartitionByRange`` + ``sortWithinPartitions``), then
2. number rows per partition and add each partition's cumulative offset
   (``zipWithIndex`` does both in one pass: a tiny count-per-partition
   job, then a map — no second shuffle, no driver collect of data).

The result is exactly ``rank-by-value - 1``: deterministic regardless of
where the range sampler happens to place partition boundaries, because
range partitions are themselves ordered. This is the one sanctioned RDD
drop-down in the engine — per-partition index arithmetic is imperative by
nature and has no Catalyst expression.

No reference equivalent (the reference's keys are md5 surrogates,
`models/facts/fact_trips.sql:9-16`); dense ids are a training-data
extension op (vocab ids, label ids, embedding-row ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def dense_ids(
    df: DataFrame,
    value_col: str,
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct values of ``value_col`` → (value, id) with id = dense rank
    by value starting at 0. Scales: no single-partition stage.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    vals = (
        df.select(value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .repartitionByRange(n, F.col(value_col))
        .sortWithinPartitions(value_col)
    )
    field = vals.schema[value_col]
    out_schema = StructType(
        [
            StructField(value_col, field.dataType, field.nullable),
            StructField(id_col, LongType(), False),
        ]
    )
    indexed = vals.rdd.map(lambda r: r[0]).zipWithIndex()
    return spark.createDataFrame(indexed, schema=out_schema)
