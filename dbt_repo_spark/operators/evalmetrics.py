"""Exact model-evaluation metrics as distributed relational plans.

A training-data engine that produces datasets for model training also
scores the models those datasets feed: ROC-AUC, calibration, lift/gains.
The textbook implementations sort all scored rows on one node (sklearn's
``roc_auc_score`` materializes the full score vector); these are the
shuffle-bounded relational equivalents, exact to the bit because every
intermediate is integer arithmetic and the single final division happens
on identical operands in any engine.

No reference equivalent (the reference pipeline stops at the mart layer);
these extend the engine toward the evaluation side of the training loop,
mirroring the rank-sum identity used by DuckDB/Postgres SQL analysts.

100 TB scale notes:
- ``roc_auc`` never creates a global single-partition window. Scores are
  grouped (|distinct scores| rows), range-shuffled into ORDERED partitions,
  prefix-summed per partition, and stitched with a 1-row-per-partition
  offset map (the two-phase rank trick from ``operators/ids.py``). The
  only driver traffic is |partitions| offset rows.
- ``lift_by_decile`` reduces to one row per entity BEFORE the global
  ntile sort, so the sort sees |entities| rows, not |facts| — same
  documented caveat as ``rfm_segments`` (entity cardinality must fit a
  sort; at 1B+ entities swap ntile for the exact_quantiles cut points in
  ``operators/ids.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ordered_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    num_partitions: int | None = None,
    sum_type: str | None = None,
) -> DataFrame:
    """Exact exclusive prefix sums in ``order_col`` order, two-phase.

    Adds ``cum_<c>_before`` (sum of ``c`` over all rows strictly before
    this one in the global order) for each ``c`` in ``sum_cols`` WITHOUT
    a global single-partition window: range-shuffle so partition *i*
    holds a contiguous ordered slice, window per partition for the local
    prefix, then add each partition's global offset (1-row-per-partition
    job → broadcast map). ``localCheckpoint`` pins the sampled range
    boundaries so the offsets job and downstream consumers see one
    layout. Driver traffic is |partitions| rows.

    ``sum_type=None`` accumulates in BIGINT — callers whose grand total
    can approach 2⁶³ (e.g. global revenue-cents prefix sums at 100 TB,
    ~2.3·10¹⁸ ≈ 4× headroom) must pass ``sum_type="decimal(38,0)"``:
    every per-partition sum, window prefix, offset literal, and the
    ``cum_``/``total_`` output columns then carry that type end-to-end,
    so no intermediate can silently wrap where ANSI mode is off.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    out_type = sum_type or "long"

    def _acc(c: str) -> Column:
        col = F.col(c)
        return col.cast(sum_type) if sum_type else col

    def _lit(v: int) -> Column:
        # build the literal ALREADY typed: F.lit(Decimal(v)) would infer
        # DecimalType(38,18) before the cast, capping offsets at ~1e20
        # instead of the full decimal(38,0) range
        return F.expr(f"CAST('{int(v)}' AS {sum_type})") if sum_type else F.lit(v)

    gp = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    parts = (
        gp.groupBy("_pid")
        .agg(*[F.sum(_acc(c)).alias(c) for c in sum_cols])
        .orderBy("_pid")
        .collect()
    )
    out = gp
    totals: dict[str, int] = {}
    for c in sum_cols:
        base: list[Column] = []
        acc = 0
        for r in parts:
            base.extend([F.lit(r._pid), _lit(acc)])
            acc += int(r[c] or 0)
        totals[c] = acc
        if not base:
            base = [F.lit(0), _lit(0)]
        offset = F.create_map(*base)[F.col("_pid")]
        w = (
            Window.partitionBy("_pid")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local_prefix = F.coalesce(F.sum(_acc(c)).over(w), _lit(0))
        out = out.withColumn(
            f"cum_{c}_before", (local_prefix + offset).cast(out_type)
        )
    # the per-partition sums already saw every row: expose the exact
    # grand totals so callers don't pay another scan to recompute them
    out = out.withColumns(
        {f"total_{c}": _lit(totals[c]).cast(out_type) for c in sum_cols}
    )
    return out


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact tie-aware ROC-AUC via the Mann-Whitney rank-sum identity.

    AUC = [Σ_g n1(g)·(2·cum_n0_before(g) + n0(g))] / (2·n1·n0)

    where g ranges over distinct score groups in ascending order: each
    positive beats every negative with a strictly lower score (weight 2)
    and half-ties every negative in its own group (weight 1). The
    numerator and denominator are exact BIGINTs; the one double division
    is performed on identical operands in any engine, so the result is
    bit-deterministic — no approximate trapezoid sampling.

    Returns a single row:
    (n_pos, n_neg, auc_num, auc_den, auc).
    """
    lab = F.col(label_col).cast("boolean")
    g = (
        df.select(F.col(score_col).alias("s"), lab.alias("y"))
        .where(F.col("s").isNotNull() & F.col("y").isNotNull())
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("n0"),
        )
    )
    scored = ordered_prefix_sums(g, "s", ["n0"], num_partitions).withColumn(
        "cb", F.col("cum_n0_before")
    )
    return scored.agg(
        F.sum("n1").cast("long").alias("n_pos"),
        F.sum("n0").cast("long").alias("n_neg"),
        F.sum(F.col("n1") * (2 * F.col("cb") + F.col("n0")))
        .cast("long")
        .alias("auc_num"),
        (2 * F.sum("n1") * F.sum("n0")).cast("long").alias("auc_den"),
        (
            F.sum(F.col("n1") * (2 * F.col("cb") + F.col("n0"))).cast("double")
            / (2 * F.sum("n1") * F.sum("n0")).cast("double")
        ).alias("auc"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic.

    D = max over observed values of |F_a(v) − F_b(v)| where F is the
    empirical CDF. Values are grouped (|distinct| rows), prefix-summed
    two-phase (no global window), and the CDF difference is evaluated at
    every distinct value — each ratio divides exact BIGINTs, so both
    engines compute identical doubles and the max is bit-deterministic.
    Emits the statistic and the leftmost value attaining it.

    ``group_col`` must be boolean-castable: true rows are sample A.

    Returns one row: (n_a, n_b, d_stat, at_value).
    """
    grp = F.col(group_col).cast("boolean")
    g = (
        df.select(F.col(value_col).alias("s"), grp.alias("ga"))
        .where(F.col("s").isNotNull() & F.col("ga").isNotNull())
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("ga"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("ga"), 0).otherwise(1)).alias("b"),
        )
    )
    p = ordered_prefix_sums(g, "s", ["a", "b"], num_partitions)
    # inclusive CDF counts at each distinct value; diff of two exact
    # divisions. Totals ride along as literals from the prefix-sum's
    # per-partition job (no extra scan); the max is a 1-row broadcast,
    # so the checkpointed grouped relation is scanned, not re-shuffled.
    p2 = p.withColumn(
        "diff",
        F.abs(
            (F.col("cum_a_before") + F.col("a")).cast("double")
            / F.col("total_a").cast("double")
            - (F.col("cum_b_before") + F.col("b")).cast("double")
            / F.col("total_b").cast("double")
        ),
    )
    dm = p2.agg(F.max("diff").alias("d_stat"))
    return (
        p2.crossJoin(F.broadcast(dm))
        .filter(F.col("diff") == F.col("d_stat"))
        .agg(
            F.max("total_a").alias("n_a"),
            F.max("total_b").alias("n_b"),
            F.max("d_stat").alias("d_stat"),
            F.min("s").alias("at_value"),
        )
    )


def lift_by_decile(
    entity_scores: DataFrame,
    id_col: str,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Gains/lift table: rank entities by model score, cut into deciles,
    report per-decile response rate, cumulative capture, and lift.

    Expects ONE ROW PER ENTITY (reduce facts to entities first). Ties
    break by id so the bucketing is deterministic. All counts are exact
    integers; each ratio is a single division of exact operands, and
    cross-decile cumulative/total terms come from windows over the
    ``n_buckets``-row aggregate (trivially small).

    Decile assignment runs on the two-phase range-partitioned rank
    (``ids.scalable_ntile``, r08) — bit-identical to the global ntile
    window but with no Exchange SinglePartition, so the entity relation
    never funnels through one task.

    Returns n_buckets rows:
    (decile, n, responders, resp_rate, cum_capture, lift).
    """
    from dbt_repo_spark.operators.ids import scalable_ntile

    ranked = scalable_ntile(
        entity_scores.select(
            F.col(id_col).alias("id"),
            F.col(score_col).alias("s"),
            F.col(label_col).cast("boolean").alias("y"),
        ),
        n_buckets,
        # struct-tuple order is ascending-only: negate the score for
        # DESC (exact for these finite doubles; ties fall to id)
        [-F.col("s"), F.col("id")],
        "decile",
    )
    agg = ranked.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("responders"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total_resp = F.sum("responders").over(wt)
    total_n = F.sum("n").over(wt)
    return agg.select(
        "decile",
        "n",
        "responders",
        (F.col("responders").cast("double") / F.col("n").cast("double")).alias(
            "resp_rate"
        ),
        (
            F.sum("responders").over(wc).cast("double") / total_resp.cast("double")
        ).alias("cum_capture"),
        (
            (F.col("responders").cast("double") / F.col("n").cast("double"))
            / (total_resp.cast("double") / total_n.cast("double"))
        ).alias("lift"),
    ).orderBy("decile")


# DeLong float tail — ONE expression text shared verbatim by both
# engines (columns m_pos, n_neg, auc_num, t10, t01 are exact integers
# identical cross-engine; every op below is a correctly-rounded IEEE
# double op on identical operands, so auc/se are bit-identical and the
# 6-dp micro rounding absorbs nothing it did not absorb in eval_bh_fdr)
DELONG_AUC = (
    "CAST(auc_num AS DOUBLE)"
    " / (2.0 * CAST(m_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"
)
DELONG_SE = (
    "CASE WHEN m_pos >= 2 AND n_neg >= 2 THEN sqrt("
    "(CAST(t10 AS DOUBLE) / (1000000000000.0"
    " * CAST(m_pos AS DOUBLE) * CAST(m_pos - 1 AS DOUBLE)))"
    " + (CAST(t01 AS DOUBLE) / (1000000000000.0"
    " * CAST(n_neg AS DOUBLE) * CAST(n_neg - 1 AS DOUBLE)))) END"
)


def delong_auc_ci(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """DeLong 95% confidence interval for the exact tie-aware ROC-AUC.

    Structural components (DeLong, DeLong & Clarke-Pearson 1988): for a
    positive at score v, V10 = (2·negBelow(v) + negAt(v)) / (2n); for a
    negative, V01 = (2·posAbove(v) + posAt(v)) / (2m). Var(AUC) =
    S10/m + S01/n with S10 = Σ(V10−AUC)²/(m−1). All components are
    CONSTANT within a distinct-score group, so everything reduces over
    the grouped relation `roc_auc` already uses — one pass of
    ordered_prefix_sums over (n0, n1), no per-row work.

    Exactness: deviations are converted to MICRO-UNITS by a
    sign-magnitude truncating division ((m·a − A)·10⁶ div 2mn — both
    engines truncate toward zero on the ABS value, sidestepping the
    floor-vs-truncate divergence on negatives), squared and summed as
    exact decimal(38,0)/HUGEINT integers; the float tail (two divisions,
    sqrt, one multiply-add per bound) runs on IDENTICAL integer inputs
    through identical expression text, so the CI is bit-deterministic
    cross-engine up to the 6-dp micro rounding (the repo's ln/exp
    convention class). The micro quantization biases each squared
    deviation by < 1e-6 of AUC scale — invisible at 6-dp output.

    Scale (100 TB): identical profile to roc_auc — the only data-sized
    stages are the distinct-score group-by and the two-phase prefix
    sums; the component/variance math folds map-side over the grouped
    relation, and the deviation squares stay inside decimal(38,0) for
    any m, n (|e| ≤ 10⁶ micros, Σ n1·e² ≤ m·10¹² ≪ 10³⁸).

    Returns one row: (m_pos, n_neg, auc_num, auc_micros, se_micros,
    ci_lo_micros, ci_hi_micros); CI columns are NULL when m < 2 or
    n < 2 (variance undefined), identically in any engine.
    """
    d38 = "DECIMAL(38,0)"
    lab = F.col(label_col).cast("boolean")
    g = (
        df.select(F.col(score_col).alias("s"), lab.alias("y"))
        .where(F.col("s").isNotNull() & F.col("y").isNotNull())
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("n0"),
        )
    )
    sc = ordered_prefix_sums(g, "s", ["n0", "n1"], num_partitions)
    comp = sc.select(
        "n1",
        "n0",
        F.expr(f"CAST(total_n1 AS {d38})").alias("m"),
        F.expr(f"CAST(total_n0 AS {d38})").alias("n"),
        # the doubling runs INSIDE decimal(38,0) (r12 advice: evaluated
        # in BIGINT first, 2*cum wraps/errors once cumulative counts
        # near 2^62 — the docstring's "any m, n" claim needs the wide
        # type from the first operation)
        F.expr(
            f"2 * CAST(cum_n0_before AS {d38}) + CAST(n0 AS {d38})"
        ).alias("a"),
        F.expr(
            f"2 * (CAST(total_n1 AS {d38}) - CAST(cum_n1_before AS"
            f" {d38}) - CAST(n1 AS {d38})) + CAST(n1 AS {d38})"
        ).alias("b"),
    )
    tot = comp.agg(
        F.sum(F.expr(f"CAST(n1 AS {d38}) * a")).alias("auc_num_d")
    )
    dev = comp.crossJoin(F.broadcast(tot)).selectExpr(
        "n1",
        "n0",
        "m",
        "n",
        "auc_num_d",
        "m * a - auc_num_d AS d10",
        "n * b - auc_num_d AS d01",
        "2 * m * n AS mn2",
    )
    e = dev.selectExpr(
        "n1",
        "n0",
        "m",
        "n",
        "auc_num_d",
        "CASE WHEN d10 >= 0 THEN (d10 * 1000000) div mn2"
        "     ELSE -(((-d10) * 1000000) div mn2) END AS e10",
        "CASE WHEN d01 >= 0 THEN (d01 * 1000000) div mn2"
        "     ELSE -(((-d01) * 1000000) div mn2) END AS e01",
    )
    agg = e.agg(
        F.expr("CAST(MAX(m) AS BIGINT)").alias("m_pos"),
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_neg"),
        F.expr("CAST(MAX(auc_num_d) AS BIGINT)").alias("auc_num"),
        F.expr(
            f"SUM(CAST(n1 AS {d38}) * CAST(e10 AS {d38})"
            f" * CAST(e10 AS {d38}))"
        ).alias("t10"),
        F.expr(
            f"SUM(CAST(n0 AS {d38}) * CAST(e01 AS {d38})"
            f" * CAST(e01 AS {d38}))"
        ).alias("t01"),
    )
    return (
        agg.selectExpr(
            "m_pos", "n_neg", "auc_num",
            f"{DELONG_AUC} AS auc_d", f"{DELONG_SE} AS se_d",
        )
        .selectExpr(
            "m_pos",
            "n_neg",
            "auc_num",
            "CAST(round(auc_d * 1000000, 0) AS BIGINT) AS auc_micros",
            "CAST(round(se_d * 1000000, 0) AS BIGINT) AS se_micros",
            "CAST(round((auc_d - 1.96 * se_d) * 1000000, 0) AS BIGINT)"
            " AS ci_lo_micros",
            "CAST(round((auc_d + 1.96 * se_d) * 1000000, 0) AS BIGINT)"
            " AS ci_hi_micros",
        )
    )
