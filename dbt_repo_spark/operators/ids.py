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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# Synthetic-namespace tag for mixing two entity key spaces in one node/id
# column (order↔part graph nodes, media twins...). 2^40 ≈ 1.1e12 sits far
# above any realistic TPC-H key or doc id at any scale factor this engine
# targets, and tagged_id() asserts the contract IN-plan — a fixed
# "round-number" offset like 1e9 silently collides once keys outgrow it
# (and an oracle applying the identical offset would stay green while the
# semantics broke — the failure mode this constant + guard removes).
SYNTH_ID_TAG = 1 << 40


def tagged_id(key: Column, tag: int = SYNTH_ID_TAG, what: str = "key") -> Column:
    """``key + tag`` with the namespace contract enforced in the plan:
    every row must satisfy 0 <= key < tag or the job fails loudly
    (assert_true folded into the value expression, so column pruning can
    never elide the check). Use for every synthetic id-space offset."""
    k = key.cast("long")
    return F.when(
        F.assert_true(
            (k >= 0) & (k < F.lit(tag).cast("long")),
            F.lit(
                f"tagged_id: {what} outside [0, {tag}) — the synthetic "
                "id namespaces would collide; raise the tag"
            ),
        ).isNull(),
        k + F.lit(tag).cast("long"),
    )


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
    ranks: list[int] | None = None,
    num_partitions: int | None = None,
    ranks_of_n=None,
) -> dict[int, object]:
    """Values at exact 0-based GLOBAL ranks without a single-node sort —
    the discrete sibling of ``exact_quantiles`` (same two-phase shape:
    range-shuffle, per-partition counts, extract just the located rows).
    Returns {rank: value}; ranks beyond n-1 are clamped to the max row.

    ``ranks_of_n`` (callable n -> list[int]) computes the target ranks
    from the relation size AFTER the per-partition count job, folding
    the caller's separate COUNT(*) into this pass (quantile_normalize's
    knot grid needs ranks of the form i*(n-1)//k).

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
        if ranks_of_n is not None:
            ranks = list(ranks_of_n(n))
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
    Exchange-SinglePartition a global window plans — boundary order
    statistics + a zero-shuffle broadcast comparison.

    Phase 1 (boundary extraction): range-shuffle ONLY the order-key
    projection (the exact_quantiles recipe: ordered partitions,
    1-row-per-partition count job, locate the n-1 tile-edge ranks from
    the cumulative offsets, fetch just those rows). The edge ranks come
    from SQL ntile's split — the first N mod n tiles hold ⌈N/n⌉ rows,
    the rest ⌊N/n⌋ — so boundary j is the LAST key tuple of tile j.
    Phase 2 (assignment): tile = 1 + Σ_j [key_tuple > boundary_j], a
    per-row struct comparison against n-1 broadcast literals — the main
    relation is never shuffled, checkpointed, or window-sorted at all.
    Exactness needs the order to be TOTAL (callers pass a tie-break
    key, same as they must for the window form to be deterministic):
    then rows ≤ boundary_j sit in tiles ≤ j, bit-identical to
    ``F.ntile(n).over(Window.orderBy(...))``. When N < n the duplicate
    clamped boundaries still yield tile = rank (one row per tile).

    ``order_cols`` entries are names or Column EXPRESSIONS; ordering is
    the ascending lexicographic tuple order, so express a descending
    dimension by negating it (e.g. ``-F.col("score")``) — struct
    comparison has no per-field direction.

    Scale: the sorted relation is a 2-ish-column projection; the
    assignment is map-side. This replaces both the global ntile window
    (single-task sort of the relation) and the first-cut two-phase
    window form (localCheckpoint + full-relation rewrite): ~3 tiny jobs
    per call, measured ~3x cheaper at sf0.1 and structurally free of
    data-sized single-partition stages.
    """
    import bisect

    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    named = [c.alias(f"_o{i}") for i, c in enumerate(cols)]
    onames = [f"_o{i}" for i in range(len(cols))]
    sel = df.select(*named)
    # exact field types of the key tuple: boundary literals must cast to
    # these (and carry the same field names) or the struct comparison
    # fails type resolution (e.g. TIMESTAMP_NTZ vs TIMESTAMP literals)
    otypes = [f.dataType for f in sel.schema.fields]
    vals = (
        sel
        .repartitionByRange(nparts, *[F.col(c) for c in onames])
        .sortWithinPartitions(*onames)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        parts = (
            vals.groupBy("_pid")
            .agg(F.count("*").alias("c"), F.min("_mid").alias("mid0"))
            .orderBy("_pid")
            .collect()
        )
        total = sum(r.c for r in parts)
        if total == 0:
            return df.withColumn(out_col, F.lit(None).cast("int")).where(
                F.lit(False)
            )
        offsets, acc = [], 0
        for r in parts:
            offsets.append(acc)
            acc += r.c
        big = total % n_tiles
        size_small = total // n_tiles
        size_big = size_small + 1
        # 0-based rank of the LAST row of tile j, clamped for N < n
        edge_ranks = []
        cum = 0
        for j in range(1, n_tiles):
            cum += size_big if j <= big else size_small
            edge_ranks.append(min(cum, total) - 1)
        mids, mid_to_rank = [], {}
        for r in sorted(set(edge_ranks)):
            i = bisect.bisect_right(offsets, r) - 1
            mid = parts[i].mid0 + (r - offsets[i])
            mids.append(mid)
            mid_to_rank[mid] = r
        picked = {
            mid_to_rank[row["_mid"]]: tuple(row[c] for c in onames)
            for row in vals.where(F.col("_mid").isin(mids)).collect()
        }
    finally:
        vals.unpersist()
    key = F.struct(*named)
    tile = F.lit(1)
    for r in edge_ranks:
        b = F.struct(
            *[
                F.lit(v).cast(dt).alias(n)
                for v, dt, n in zip(picked[r], otypes, onames)
            ]
        )
        tile = tile + (key > b).cast("int")
    return df.withColumn(out_col, tile.cast("int"))
