"""Dense ID assignment (vocabulary indexing) without a global window.

The naive way to number a vocabulary — ``row_number() OVER (ORDER BY
term)`` — collapses the whole table into ONE partition (Exchange
SinglePartition) and dies exactly when the vocab is big enough to matter.
The scalable shape is the classic two-phase rank:

1. range-shuffle the distinct values so partition *i* holds a contiguous,
   sorted slice (``repartitionByRange`` + ``sortWithinPartitions``), then
2. number rows per partition (``monotonically_increasing_id`` assigned in
   the same stage as the sort is consecutive within each partition) and
   add each partition's cumulative offset (a 1-row-per-partition count
   job, then a broadcast-map column lookup — no second shuffle, no
   driver collect of data, no Python row boundary).

The result is exactly ``rank-by-value - 1``: deterministic regardless of
where the range sampler happens to place partition boundaries, because
range partitions are themselves ordered.

No reference equivalent (the reference's keys are md5 surrogates,
`models/facts/fact_trips.sql:9-16`); dense ids are a training-data
extension op (vocab ids, label ids, embedding-row ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


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
    # JVM-side two-phase rank: monotonically_increasing_id in the same
    # stage as the per-partition sort gives consecutive record numbers
    # within each ordered partition; a 1-row-per-partition count job
    # yields the cumulative offsets, applied as a broadcast map lookup.
    # No RDD, no Python row boundary (the previous zipWithIndex form
    # round-tripped every value through pickle — same wall-clock at
    # fixture scale where job overhead dominates, but the serialization
    # cost grows with the vocab while this path's does not).
    # The eager localCheckpoint pins the partition layout: _mid must not
    # be recomputed under a re-sampled range shuffle, and downstream
    # actions read the materialized blocks instead of re-shuffling.
    vals = (
        df.select(value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .repartitionByRange(n, F.col(value_col))
        .sortWithinPartitions(value_col)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    parts = (
        vals.groupBy("_pid")
        .agg(F.count("*").alias("c"), F.min("_mid").alias("mid0"))
        .orderBy("_pid")
        .collect()
    )
    base: list = []  # flattened (pid, offset - mid0) pairs for create_map
    acc = 0
    for r in parts:
        base.extend([F.lit(r._pid), F.lit(acc - r.mid0)])
        acc += r.c
    if not base:
        return vals.select(
            value_col, F.lit(0).cast(LongType()).alias(id_col)
        ).where(F.lit(False))
    shift = F.create_map(*base)[F.col("_pid")]
    return vals.select(
        value_col, (F.col("_mid") + shift).cast(LongType()).alias(id_col)
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Exact linear-interpolation quantiles WITHOUT a single-node buffer.

    Spark's ``percentile`` aggregate is exact but materializes every
    value in the final reducer — the global-percentile call is an
    Exchange-SinglePartition in disguise and dies first at scale. This is
    the distributed-exact shape: range-shuffle the values (ordered
    partitions), count per partition (tiny job), locate each target rank
    in its partition from the cumulative offsets, and extract just those
    positions with one per-partition scan. No node ever holds more than
    its slice; the driver receives |probs| values.

    Interpolation matches ``percentile``/DuckDB ``quantile_cont``:
    h = p·(n-1); v = v_lo + (h - lo)·(v_hi - v_lo).
    """
    import bisect
    import math

    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # Everything stays JVM-side: sorted-within-ordered-partitions values
    # get a monotonically_increasing_id in the same stage (record number
    # is consecutive within a partition), so (partition, local position)
    # is pure column arithmetic — no RDD, no Python row boundary.
    vals = (
        df.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .repartitionByRange(nparts, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        parts = (
            vals.groupBy("pid")
            .agg(F.count("*").alias("c"), F.min("mid").alias("mid0"))
            .orderBy("pid")
            .collect()
        )
        n = sum(r.c for r in parts)
        if n == 0:
            return [None] * len(probs)
        offsets = []  # global index of each partition's first row
        acc = 0
        for r in parts:
            offsets.append(acc)
            acc += r.c
        ranks = sorted(
            {r for p in probs for r in (math.floor(p * (n - 1)), math.ceil(p * (n - 1)))}
        )
        # global rank -> the exact mid literal of that row
        mids, mid_to_rank = [], {}
        for r in ranks:
            i = bisect.bisect_right(offsets, r) - 1
            mid = parts[i].mid0 + (r - offsets[i])
            mids.append(mid)
            mid_to_rank[mid] = r
        picked = {
            mid_to_rank[row.mid]: row.v
            for row in vals.where(F.col("mid").isin(mids)).collect()
        }
    finally:
        vals.unpersist()
    out = []
    for p in probs:
        h = p * (n - 1)
        lo = math.floor(h)
        hi = math.ceil(h)
        v_lo, v_hi = picked[lo], picked[hi]
        out.append(float(v_lo + (h - lo) * (v_hi - v_lo)))
    return out


def exact_order_statistics(
    df: DataFrame,
    value_col: str,
    ranks: list[int],
    num_partitions: int | None = None,
) -> dict[int, object]:
    """Values at exact 0-based GLOBAL ranks without a single-node sort —
    the discrete sibling of ``exact_quantiles`` (same two-phase shape:
    range-shuffle, per-partition counts, extract just the located rows).
    Returns {rank: value}; ranks beyond n-1 are clamped to the max row.

    This is the scale path for order-statistic knot grids
    (quantile_normalize's 101 knots): the old form ranked the WHOLE
    relation through one global row_number window to pick 101 rows.
    Here no task ever holds more than its range slice and the driver
    receives |ranks| values.
    """
    import bisect

    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    vals = (
        df.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .repartitionByRange(nparts, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        parts = (
            vals.groupBy("pid")
            .agg(F.count("*").alias("c"), F.min("mid").alias("mid0"))
            .orderBy("pid")
            .collect()
        )
        n = sum(r.c for r in parts)
        if n == 0:
            return {}
        offsets, acc = [], 0
        for r in parts:
            offsets.append(acc)
            acc += r.c
        want = sorted({min(max(r, 0), n - 1) for r in ranks})
        mids, mid_to_rank = [], {}
        for r in want:
            i = bisect.bisect_right(offsets, r) - 1
            mid = parts[i].mid0 + (r - offsets[i])
            mids.append(mid)
            mid_to_rank[mid] = r
        picked = {
            mid_to_rank[row.mid]: row.v
            for row in vals.where(F.col("mid").isin(mids)).collect()
        }
    finally:
        vals.unpersist()
    return {r: picked[min(max(r, 0), n - 1)] for r in ranks}


def scalable_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` WITHOUT the
    Exchange-SinglePartition a global window plans — the two-phase rank
    (dense_ids' recipe) plus SQL ntile's closed-form tile assignment.

    Phase 1: range-shuffle on the (total-order) ``order_cols`` so
    partition *i* holds a contiguous ordered slice; number rows per
    partition with a window that sorts ONE partition per task; add each
    partition's cumulative row offset (1-row-per-partition count job →
    broadcast map) to get the exact global 1-based row_number rn.
    Phase 2: the standard ntile split — the first N mod n tiles get
    ⌈N/n⌉ rows, the rest ⌊N/n⌋ — is pure column arithmetic on rn, with
    N known exactly from the offsets job. Result is bit-identical to
    ``F.ntile(n).over(Window.orderBy(*order_cols))`` for any total
    order (callers must include a tie-break key, same as they must for
    the window form to be deterministic).

    One extra count job vs the window form; no single-task sort of the
    relation anywhere. The eager localCheckpoint pins the sampled range
    boundaries so the offsets job and downstream consumers see one
    layout (ordered_prefix_sums' contract).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # order_cols entries may be names or Column sort expressions
    # (e.g. F.col("score").desc()) — range partitioning, the local
    # sort, and the local window must all use the SAME total order
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    gp = (
        df.repartitionByRange(nparts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    parts = gp.groupBy("_pid").count().orderBy("_pid").collect()
    base: list = []
    total = 0
    for r in parts:
        base.extend([F.lit(r._pid), F.lit(total)])
        total += r["count"]
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int")).where(
            F.lit(False)
        )
    offset = F.create_map(*base)[F.col("_pid")]
    w = Window.partitionBy("_pid").orderBy(*cols)
    rn = F.row_number().over(w) + offset  # exact global 1-based rank
    big = total % n_tiles
    size_small = total // n_tiles
    size_big = size_small + 1
    cut = big * size_big
    first = F.floor((rn - 1) / F.lit(size_big)) + 1
    if size_small == 0:
        tile = first  # fewer rows than tiles: every row its own tile
    else:
        rest = F.lit(big) + F.floor((rn - 1 - cut) / F.lit(size_small)) + 1
        tile = F.when(rn <= F.lit(cut), first).otherwise(rest)
    return gp.withColumn(out_col, tile.cast("int")).drop("_pid")
