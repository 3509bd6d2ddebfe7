"""Mergeable sketch summaries: store-and-union distinct-count sketches.

The reference computes distincts directly (dim_stations dedup,
models/dimensions/dim_stations.sql:5-19); at 100 TB the dashboard-grade
pattern is a SKETCH TABLE: aggregate each day's keys into a fixed-size
Apache DataSketches HLL once at ingest, persist the binary sketch next to
the date, and answer "distinct users over any date range" by unioning a
handful of KB-sized sketches — no rescan of the fact, no shuffle of the
key set, error ~1-2% at lgK=12. Sketch union is associative/commutative,
so partial sketches merge map-side exactly like partial sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch_table(
    df: DataFrame,
    key: str,
    time_col: str,
    grain: str = "day",
    lgk: int = 12,
) -> DataFrame:
    """Per-period HLL sketches of ``key``: (period, n_rows, sketch binary).

    One hash-agg pass; the output is period-cardinality-sized and each
    sketch is a few KB regardless of key cardinality. Persist this next
    to the fact table and maintain it incrementally (a new day appends
    one row; a restated partition overwrites one row).
    """
    period = F.date_trunc(grain, F.col(time_col)).alias("period")
    return df.groupBy(period).agg(
        F.count("*").alias("n_rows"),
        F.hll_sketch_agg(key, F.lit(lgk)).alias("sketch"),
    )


def union_distinct_estimate(
    sketches: DataFrame,
    period_pred: Column | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Distinct estimate over an arbitrary period range by sketch union.

    Scans only the sketch table (|periods| rows × KB), never the fact.
    """
    if period_pred is not None:
        sketches = sketches.filter(period_pred)
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct")
    )


def heavy_hitters(df: DataFrame, key_col: str, theta: float = 0.001) -> DataFrame:
    """Exact frequent items above ``theta``·N via Misra-Gries candidates +
    exact verification — no full-key shuffle.

    Per partition, a Misra-Gries summary of capacity ceil(1/theta) runs
    over the Arrow batches (decrement-all when full). Any key with global
    count > theta·N must exceed theta·N_p in at least one partition
    (averaging), and MG capacity 1/theta keeps every locally-theta-heavy
    key, so the union of per-partition candidates is a SUPERSET of the
    true heavy hitters. The exact pass then counts ONLY candidate keys
    (broadcast semi-join prunes before the shuffle) and filters to
    count > theta·N — output is exact, so the operator oracle-checks
    against plain GROUP BY/HAVING while shuffling |candidates| ≤
    partitions/theta keys instead of the full key set.

    Output: (key, cnt) for every key with cnt > theta * N.
    """
    import math

    import pandas as pd

    cap = max(1, math.ceil(1.0 / theta))

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for k, c in pdf[key_col].value_counts().items():
                if k in counters:
                    counters[k] += int(c)
                elif len(counters) < cap:
                    counters[k] = int(c)
                else:
                    # decrement-all by the smallest surviving increment
                    dec = min(int(c), min(counters.values()))
                    counters = {
                        k2: v - dec for k2, v in counters.items() if v > dec
                    }
                    if int(c) > dec:
                        counters[k] = int(c) - dec
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys())})

    candidates = (
        df.select(key_col).mapInPandas(mg_partition, schema=df.select(key_col).schema)
    ).distinct()
    n = df.count()
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > theta * n)
    )


def quantile_sketch_table(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    time_col: str,
    grain: str = "day",
    k: int = 32,
) -> DataFrame:
    """Per-(keys, period) quantile-grid sketches: (keys, period, n_rows,
    grid) where ``grid`` holds the k+1 evenly-spaced quantiles of
    ``value_col`` (a compressed CDF; rank error ≤ 1/k per sketch, plus
    percentile_approx's own bounded error while building).

    The quantile analogue of ``distinct_sketch_table``: one hash-agg pass
    at ingest, output sized by group count not data size, maintained
    incrementally (a restated partition overwrites one row). Spark ships
    no storable quantile sketch (approx_percentile's summary is
    plan-internal), so the stored form is the grid itself — unlike raw
    percentiles, grids ARE mergeable with bounded error because each
    carries its row count (see ``merge_quantile_estimate``).
    """
    probs = F.array(*[F.lit(i / k) for i in range(k + 1)])
    period = F.date_trunc(grain, F.col(time_col)).alias("period")
    return df.groupBy(*key_cols, period).agg(
        F.count("*").alias("n_rows"),
        F.percentile_approx(value_col, probs, F.lit(10000)).alias("grid"),
    )


def merge_quantile_estimate(
    sketches: DataFrame,
    key_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """Quantiles over any union of sketch rows — without rescanning facts.

    Each grid cell [g_{i-1}, g_i] holds n_rows/k of its group's mass;
    assigning that weight to the cell's upper endpoint makes each sketch a
    weighted empirical CDF, and merging is just pooling the weighted
    points: sort per rollup key, running-sum the weights, and read the
    smallest point whose cumulative mass reaches p·total. Work is
    O(|sketch rows| × (k+1)) — periods times a constant, NOT data size;
    the per-key window runs over that tiny pooled relation.

    Rank error: ≤ 1/k per source sketch (weight quantized to its upper
    endpoint) — the merged estimate stays within max_g(1/k_g) ranks of
    exact, independent of how many sketches pool.

    Output: one row per (keys, prob): (keys..., prob, value_est).
    """
    from pyspark.sql import Window

    pts = (
        sketches.select(
            *key_cols,
            F.col("n_rows"),
            (F.size("grid") - 1).alias("__k"),
            F.posexplode("grid").alias("pos", "x"),
        )
        .withColumn(
            "w",
            F.when(F.col("pos") == 0, F.lit(0.0)).otherwise(
                F.col("n_rows") / F.col("__k")
            ),
        )
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("x", "pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*key_cols)
    pts = pts.withColumn("cum", F.sum("w").over(w_cum)).withColumn(
        "total", F.sum("w").over(w_tot)
    )
    probs_df = F.explode(F.array(*[F.lit(p) for p in probs])).alias("prob")
    return (
        pts.select(*key_cols, "x", "cum", "total", probs_df)
        .filter(F.col("cum") >= F.col("prob") * F.col("total") - F.lit(1e-9))
        .groupBy(*key_cols, "prob")
        .agg(F.min("x").alias("value_est"))
    )
