"""Round-11 additions: evidence-closure queries.

`graph_weighted_sssp_converged` exists to MEASURE the true-frontier
short-circuit that `graph_weighted_sssp`'s 4-round fixture cannot show
(r10 verdict watch-item #1): on the 1/64-density seed set the ball is
still expanding at every measured round, so the improved-frontier is
approximately the ball and the early-exit never fires inside the
measurement window. This fixture is built so the frontier EMPTIES
mid-run — rounds past the fixpoint are then skipped entirely — while
staying full-oracle-checkable (the unrolled CTEs are fixpoint-stable,
so the 12-round oracle equals the short-circuited run bit for bit).

No reference equivalent; cites for the family shape: SURVEY.md §2.4
(iterative relational plans), `operators/graph.py::weighted_sssp`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_repo_spark.operators.ids import SYNTH_ID_TAG
from dbt_repo_spark.queries import q, t

# Per-hop fixed cost: any h-hop path costs in [1001h, 1050h], so for
# h <= 20 a path with more hops is ALWAYS heavier (1001(h+1) > 1050h
# iff h < 20.4) — weighted shortest paths therefore finalize at their
# BFS hop count and the improved-frontier empties one round past the
# seed set's hop eccentricity (measured 5-7 on this fixture, scales
# 0.001-0.1) instead of drifting toward |V| as free-form weights allow.
_SSSP_HOP_COST = 1000
_SSSP_CONV_ITERS = 12
_SSSP_CONV_SEED_MOD = 512


def _sssp_converged_oracle(iters: int = _SSSP_CONV_ITERS) -> str:
    # AS MATERIALIZED is load-bearing: each round references the previous
    # CTE twice, and DuckDB inlines plain CTEs per reference — 12 rounds
    # would re-expand into 2^12 copies of round 1 (measured: the plain
    # text never finishes at sf0.001; materialized runs in 70 ms). The
    # 4-round sibling tolerates plain CTEs (2^4 cheap subtrees).
    rounds = []
    for r in range(1, iters + 1):
        rounds.append(
            f"""s{r} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM s{r - 1}
        UNION ALL
        SELECT e.dst AS node, s{r - 1}.dist + e.w AS dist
        FROM s{r - 1} JOIN e ON e.src = s{r - 1}.node)
      GROUP BY node)"""
        )
    return f"""
    WITH e AS (
      SELECT l_orderkey AS src, l_partkey + {SYNTH_ID_TAG} AS dst,
             {_SSSP_HOP_COST} + CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      UNION ALL
      SELECT l_partkey + {SYNTH_ID_TAG} AS src, l_orderkey AS dst,
             {_SSSP_HOP_COST} + CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    seeds AS (SELECT DISTINCT l_orderkey AS node FROM lineitem
              WHERE l_orderkey % {_SSSP_CONV_SEED_MOD} = 0),
    s0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
    {", ".join(rounds)}
    SELECT dist // 100 AS dist_bucket, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(dist) AS min_dist, MAX(dist) AS max_dist,
           CAST(SUM(dist) AS BIGINT) AS sum_dist
    FROM s{iters} GROUP BY 1
    """


@q("graph_weighted_sssp_converged", _sssp_converged_oracle())
def graph_weighted_sssp_converged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact shortest distances to FIXPOINT (not a hop bound) over the
    order↔part bipartite graph with per-hop-cost-floored weights
    (w = 1000 + line quantity) from a sparse seed set (1/512 orders) —
    the post-saturation twin of `graph_weighted_sssp` whose job is to
    exercise weighted_sssp's frontier short-circuit: iters=12 exceeds
    the seed set's hop eccentricity (5-7 measured at sf0.001-0.1), so
    the improved-frontier EMPTIES mid-run and the remaining rounds are
    skipped — per-round work past the fixpoint would otherwise be an
    O(|ball|) full-outer merge + checkpoint each, which is what the
    early exit saves (measured A/B in SCALE.md).

    The hop-cost floor is what makes convergence structural: any h-hop
    path costs in [1001h, 1050h], so for h ≤ 20 more hops are always
    heavier and every node's distance finalizes at its BFS hop count
    (free-form weights can keep improving for up to |V| rounds, which
    is why the 4-round sibling keeps its bounded-round contract). The
    12-round unrolled oracle is fixpoint-stable — rounds past
    convergence are relational no-ops — so the short-circuited Spark
    run and the always-12-round DuckDB text agree bit for bit; all
    arithmetic is integer MIN-of-sums (order-independent, full-oracle
    safe). Output: per 100-unit distance bucket, node count + distance
    extrema and mass.

    Scale (100 TB): per-round cost is frontier-linear (see
    weighted_sssp); the short-circuit bounds total rounds by the seed
    set's hop eccentricity — a DATA property that stays fixed as
    disjoint corpus replicas multiply |V| and |E| — so total work is
    O(eccentricity · |E|) regardless of the iters safety bound.
    """
    from dbt_repo_spark.operators.graph import weighted_sssp
    from dbt_repo_spark.operators.ids import tagged_id

    li = t(spark, sf_dir, "lineitem")
    part = tagged_id(F.col("l_partkey"), what="l_partkey")
    order_guard = tagged_id(F.col("l_orderkey"), what="l_orderkey") - F.lit(
        SYNTH_ID_TAG
    ).cast("long")
    w = F.lit(_SSSP_HOP_COST).cast("long") + F.col("l_quantity").cast("long")
    edges = li.select(
        order_guard.alias("src"), part.alias("dst"), w.alias("w")
    ).unionByName(
        li.select(part.alias("src"), order_guard.alias("dst"), w.alias("w"))
    )
    seeds = (
        li.filter(F.col("l_orderkey") % _SSSP_CONV_SEED_MOD == 0)
        .select(F.col("l_orderkey").alias("node"))
        .distinct()
    )
    dist = weighted_sssp(edges, seeds, iters=_SSSP_CONV_ITERS)
    return dist.groupBy(F.expr("dist div 100").alias("dist_bucket")).agg(
        F.count("*").alias("n_nodes"),
        F.min("dist").alias("min_dist"),
        F.max("dist").alias("max_dist"),
        F.sum("dist").cast("long").alias("sum_dist"),
    )


@q(
    "incremental_runner_tick",
    """
    WITH final AS (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 8 <> 0 OR o_orderkey % 24 = 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM final GROUP BY 1
    """,
)
def incremental_runner_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 incremental materialization exercised END-TO-END at sweep
    scale (r10 verdict ask #5): build a unique-keyed incremental target
    from batch 1 (orders with key % 8 ≠ 0), then tick batch 2 (keys
    % 3 = 0 — overlapping batch 1 on keys % 3 = 0 ∧ % 8 ≠ 0, novel on
    keys % 24 = 0) through `ModelRunner._materialize`'s is_incremental
    branch: anti-join against {{ this }} keys, append only the novel
    rows. The returned relation is the final target rolled up per
    order status — so the oracle certifies BOTH dedup (overlap rows
    appended exactly once) and completeness (every batch-1 and novel
    batch-2 row present): the final table must equal `orders WHERE
    key % 8 ≠ 0 OR key % 24 = 0` exactly, in integer cents.

    Scale (100 TB): the tick's only target-sized term is a KEY-COLUMN
    scan ({{ this }} is projected to unique_key before the anti-join,
    so parquet ReadSchema prunes to one column — pinned by
    `test_r11_ops.py::test_incremental_tick_target_read_prunes_to_key`
    via `runner.last_incremental_plan`); everything else is
    O(new batch). The growth row (SCALE.md r11) measures the composed
    build+tick staying linear in corpus size.
    """
    import shutil
    import tempfile

    from dbt_repo_spark.plans.runner import ModelRunner, model
    from dbt_repo_spark.sources.catalog import Catalog

    orders = t(spark, sf_dir, "orders")
    batch1 = orders.filter(F.col("o_orderkey") % 8 != 0)
    batch2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    root = tempfile.mkdtemp(prefix="inc_tick_")
    try:
        cat = Catalog(spark, root)
        m = model(
            "fact_orders_inc",
            deps=("orders_batch",),
            materialized="incremental",
            unique_key="o_orderkey",
        )(lambda ctx: ctx["orders_batch"])
        runner = ModelRunner(spark, cat, {"orders_batch": batch1}).add(m)
        runner.run(["fact_orders_inc"])
        runner.sources["orders_batch"] = batch2
        final = runner.run(["fact_orders_inc"])["fact_orders_inc"]
        out = final.groupBy("o_orderstatus").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        # the target's parquet files die with the temp dir below —
        # materialize the (|statuses|-row) rollup before returning
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# isotonic calibration: bins are deterministic value buckets (no global
# sort), capped so the hull relation is bounded at any corpus size
_ISO_BIN_CENTS = 1_000_000  # $10k per bin
_ISO_BIN_CAP = 40


@q(
    "eval_isotonic_calibration",
    f"""
    WITH base AS (
      SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                        AS BIGINT) // {_ISO_BIN_CENTS}, {_ISO_BIN_CAP})
               AS score_bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    g AS (SELECT score_bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(label) AS BIGINT) AS s
          FROM base GROUP BY 1),
    pts AS (SELECT score_bin, n, s,
                   CAST(row_number() OVER (ORDER BY score_bin) AS BIGINT)
                     AS idx,
                   CAST(SUM(n) OVER (ORDER BY score_bin) AS BIGINT) AS cn,
                   CAST(SUM(s) OVER (ORDER BY score_bin) AS BIGINT) AS cs
            FROM g),
    p AS (SELECT idx, cn, cs FROM pts
          UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                           CAST(0 AS BIGINT)),
    viol AS (SELECT DISTINCT m.idx
             FROM p m JOIN p a ON a.idx < m.idx
                      JOIN p b ON b.idx > m.idx
             WHERE CAST(m.cs - a.cs AS HUGEINT) * (b.cn - a.cn)
                   >= CAST(b.cs - a.cs AS HUGEINT) * (m.cn - a.cn)),
    verts AS (SELECT p.idx, p.cn, p.cs FROM p
              LEFT JOIN viol USING (idx) WHERE viol.idx IS NULL),
    segs AS (SELECT idx AS v1, cn AS n1, cs AS s1,
                    LEAD(idx) OVER (ORDER BY idx) AS v2,
                    LEAD(cn) OVER (ORDER BY idx) AS n2,
                    LEAD(cs) OVER (ORDER BY idx) AS s2
             FROM verts),
    outp AS (SELECT pts.score_bin, pts.n, pts.s,
                    segs.s2 - segs.s1 AS iso_num,
                    segs.n2 - segs.n1 AS iso_den
             FROM pts JOIN segs
               ON pts.idx > segs.v1 AND pts.idx <= segs.v2)
    SELECT score_bin, n, s, iso_num, iso_den,
           CAST((CAST(iso_num AS HUGEINT) * 1000000) // iso_den
                AS BIGINT) AS iso_rate_micros
    FROM outp
    """,
)
def eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic regression (PAVA's solution) of order-failure rate
    on order-value bins — the monotone calibrator the eval family lacked
    next to `calibration_bins` (which only measures miscalibration) and
    `eval_conformal_mondrian` (distribution-free intervals): isotonic is
    the standard score→probability map when the only assumption you can
    defend is monotonicity.

    No iterative pooling: the isotonic fit equals the slope of the
    GREATEST CONVEX MINORANT of the cumulative sum diagram (Barlow &
    Brunk 1972), and a diagram point is a GCM vertex iff it lies
    STRICTLY BELOW every chord spanning it — a universally-quantified
    INTEGER predicate, decided exactly by cross-multiplication
    ((S_m−S_a)(N_b−N_a) ≥ (S_b−S_a)(N_m−N_a) drops m; denominators are
    positive since every bin holds ≥ 1 row, products ride
    decimal(38,0)/HUGEINT). Collinear interior points drop without
    changing any slope, so the vertex set is deterministic. Per-bin
    output is the enclosing hull segment's slope as an exact rational
    (iso_num/iso_den = pooled failures / pooled count) plus the
    truncating micro-rate — zero floating point anywhere, full oracle.

    Scale (100 TB): one fact scan folds to ≤ 41 deterministic value
    bins (map-side combinable — bins are LEAST(cents div 1e6, 40), no
    global sort, unlike ntile calibrators); every hull relation after
    that is ≤ 42 rows, so the O(B³) chord test is ~12k integer
    predicates regardless of corpus size. The two ≤41-row ORDER BY
    windows are the documented contract-small class (same as
    eval_bh_fdr's 25-row rank).
    """
    base = t(spark, sf_dir, "orders").select(
        F.expr(
            f"LEAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100"
            f" AS BIGINT) div {_ISO_BIN_CENTS}, {_ISO_BIN_CAP})"
        ).alias("score_bin"),
        F.expr(
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    g = base.groupBy("score_bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("s"),
    )
    w = Window.orderBy("score_bin")
    # localCheckpoint the <=41-row bin relation: the hull stages below
    # reference it from EIGHT join branches, and without a
    # materialization barrier Catalyst re-expands each reference into
    # its own fact scan + aggregation (measured: 8 FileScans of orders
    # in the physical plan). The eager checkpoint runs the fact scan
    # exactly once up front; the returned hull plan then carries ZERO
    # file scans (pinned by test_plan_shapes.py::test_r11_eval_plan_shapes)
    pts = g.select(
        "score_bin",
        "n",
        "s",
        F.row_number().over(w).cast("long").alias("idx"),
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s").over(w).cast("long").alias("cs"),
    ).localCheckpoint(eager=True)
    origin = spark.range(1).select(
        F.lit(0).cast("long").alias("idx"),
        F.lit(0).cast("long").alias("cn"),
        F.lit(0).cast("long").alias("cs"),
    )
    p = pts.select("idx", "cn", "cs").unionByName(origin)
    pm = p.select(
        F.col("idx").alias("m_idx"),
        F.col("cn").alias("m_cn"),
        F.col("cs").alias("m_cs"),
    )
    pa = p.select(
        F.col("idx").alias("a_idx"),
        F.col("cn").alias("a_cn"),
        F.col("cs").alias("a_cs"),
    )
    pb = p.select(
        F.col("idx").alias("b_idx"),
        F.col("cn").alias("b_cn"),
        F.col("cs").alias("b_cs"),
    )
    d38 = "DECIMAL(38,0)"
    viol = (
        pm.join(pa, F.col("a_idx") < F.col("m_idx"))
        .join(pb, F.col("b_idx") > F.col("m_idx"))
        .where(
            F.expr(
                f"CAST(m_cs - a_cs AS {d38}) * CAST(b_cn - a_cn AS {d38})"
                f" >= CAST(b_cs - a_cs AS {d38})"
                f" * CAST(m_cn - a_cn AS {d38})"
            )
        )
        .select(F.col("m_idx").alias("idx"))
        .distinct()
    )
    verts = p.join(viol, "idx", "left_anti")
    wv = Window.orderBy("idx")
    segs = verts.select(
        F.col("idx").alias("v1"),
        F.col("cn").alias("n1"),
        F.col("cs").alias("s1"),
        F.lead("idx").over(wv).alias("v2"),
        F.lead("cn").over(wv).alias("n2"),
        F.lead("cs").over(wv).alias("s2"),
    ).where(F.col("v2").isNotNull())
    return (
        pts.join(
            segs,
            (F.col("idx") > F.col("v1")) & (F.col("idx") <= F.col("v2")),
        )
        .select(
            "score_bin",
            "n",
            "s",
            (F.col("s2") - F.col("s1")).alias("iso_num"),
            (F.col("n2") - F.col("n1")).alias("iso_den"),
        )
        .withColumn(
            "iso_rate_micros",
            F.expr(
                f"CAST((CAST(iso_num AS {d38}) * 1000000)"
                f" div CAST(iso_den AS {d38}) AS BIGINT)"
            ),
        )
    )


# Poisson(1) inverse-CDF thresholds scaled to 2^32 (floor of the
# cumulative probabilities x 2^32, k = 0..9; tail prob ~1.1e-7 caps at
# w=10). The CONSTANTS are what both engines share — determinism comes
# from comparing the same md5-derived uniform against the same integer
# ladder, not from the ladder being exactly e^-1-derived.
_BOOT_POIS_T = [
    1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
    4292415291, 4294609777, 4294923276, 4294962463, 4294966817,
]
_BOOT_B = 64  # replicates; nearest-rank 2.5%/97.5% -> ranks 2 and 63

# Per-replicate draw mix (r12: one md5 per ORDER, not per
# (order, replicate) — the r11 verdict's ask #6; at 8x corpus the old
# recipe hashed 76M strings, the new one hashes 1.2M and derives the 64
# replicate uniforms with ~12 integer ops each). The mix is a
# SplitMix/murmur-fmix-shaped add-multiply + two xorshift-multiply
# rounds, with every multiplicand < 2^31 so all intermediates fit in a
# BIGINT (max z * M < 2^32 * 2^31 = 2^63) — no HUGEINT/decimal needed
# on either engine. Empirically (20k keys x 64 replicates): marginal
# Poisson(1) frequencies match to 3 decimals, per-replicate mean weight
# in [0.985, 1.015], adjacent-replicate weight correlation at the
# 1/sqrt(N) noise floor.
_BOOT_MIX_A = 1000000007  # b-stride into the add stage
_BOOT_MIX_M1 = 1597334677  # xorshift-multiply round 1 (< 2^31)
_BOOT_MIX_M2 = 1812433253  # xorshift-multiply round 2 (< 2^31)
_U32 = 4294967296


def _boot_mix_steps(
    xor_fmt, shr_fmt, h: str = "h", b: str = "b"
) -> list[tuple[str, str]]:
    """The (column, expression) chain computing the replicate uniform
    u in [0, 2^32) from the per-key 32-bit hash h and replicate id b.
    Engine-specific formatters because XOR spells differently (Spark
    ``a ^ b``; DuckDB ``xor(a, b)`` — ``^`` is POWER there); the
    arithmetic is bit-identical.
    """
    return [
        ("z0", f"({h} + {b} * {_BOOT_MIX_A}) % {_U32}"),
        (
            "z1",
            f"(({xor_fmt('z0', shr_fmt('z0', 16))}) * {_BOOT_MIX_M1})"
            f" % {_U32}",
        ),
        (
            "z2",
            f"(({xor_fmt('z1', shr_fmt('z1', 13))}) * {_BOOT_MIX_M2})"
            f" % {_U32}",
        ),
        ("u", xor_fmt("z2", shr_fmt("z2", 16))),
    ]


def _boot_mix_py(h: int, b: int) -> int:
    """Python twin of _boot_mix_steps (tests compare against this)."""
    z = (h + b * _BOOT_MIX_A) % _U32
    z = ((z ^ (z >> 16)) * _BOOT_MIX_M1) % _U32
    z = ((z ^ (z >> 13)) * _BOOT_MIX_M2) % _U32
    return z ^ (z >> 16)


def _boot_w_case(u: str) -> str:
    """Shared CASE ladder mapping a uniform in [0, 2^32) to a
    Poisson(1) draw — identical text on both engines."""
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_POIS_T)
    )
    return f"CASE {arms} ELSE 10 END"


def _bootstrap_oracle() -> str:
    from dbt_repo_spark.queries import _duck_md5_fold

    h = _duck_md5_fold("substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)")
    mix = _boot_mix_steps(
        lambda a, b: f"xor({a}, {b})", lambda a, n: f"({a} >> {n})"
    )
    mix_ctes = ""
    prev = "rep0"
    for i, (col, expr) in enumerate(mix):
        name = "repm" if i == len(mix) - 1 else f"rep{i + 1}"
        mix_ctes += (
            f"    {name} AS (\n"
            f"      SELECT grp, cents, b, {expr} AS {col}"
            f" FROM {prev}),\n"
        )
        prev = name
    return f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             {h} AS h
      FROM orders),
    point AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(cents) AS HUGEINT) // COUNT(*) AS BIGINT)
               AS mean_cents
      FROM base GROUP BY 1),
    rep0 AS (
      SELECT grp, cents, h, b
      FROM base CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b)),
{mix_ctes}    rep AS (
      SELECT grp, b, {_boot_w_case("u")} AS w, cents FROM repm),
    rm AS (
      SELECT grp, b,
             CAST(SUM(CAST(w AS HUGEINT) * cents)
                  // SUM(CAST(w AS HUGEINT)) AS BIGINT) AS mean_b
      FROM rep GROUP BY 1, 2
      HAVING SUM(w) > 0),
    rk AS (
      SELECT grp, mean_b,
             row_number() OVER (PARTITION BY grp ORDER BY mean_b, b)
               AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS nb
      FROM rm)
    SELECT point.grp, point.n_orders, point.mean_cents,
           MAX(CASE WHEN nb >= 4 AND rn = 2 THEN mean_b END)
             AS boot_lo_cents,
           MAX(CASE WHEN nb >= 4 AND rn = nb - 1 THEN mean_b END)
             AS boot_hi_cents,
           CAST(MAX(nb) AS BIGINT) AS n_replicates
    FROM rk JOIN point USING (grp)
    GROUP BY 1, 2, 3
    """


@q("eval_bootstrap_ci_mean", _bootstrap_oracle())
def eval_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC Poisson bootstrap 95% CI for the per-priority mean
    order value — the uncertainty quantification the eval family lacked
    (point metrics everywhere, no sampling distribution anywhere): 64
    replicates, each reweighting every order by an independent
    Poisson(1) draw (the distributed bootstrap standard — Poisson
    counts approximate multinomial resampling without coordinating a
    global sample, Chamandy et al. 2012 / Owen & Eckles 2012).

    Exactness: the draw for (order, replicate) is ONE md5-derived
    32-bit uniform per ORDER (r12 rework — verdict ask #6; the r11
    recipe hashed 'orderkey:b' per pair, 64x the hashing for the same
    statistical content) pushed through the _boot_mix_steps integer
    mix (add-multiply + two xorshift-multiply rounds, BIGINT-safe on
    both engines) and then the shared Poisson threshold ladder.
    Replicate means are truncating integer divisions of exact integer
    sums (HUGEINT/decimal(38,0)); the CI bounds are nearest-rank order
    statistics trimming one replicate from each side (ranks 2 and
    nb−1 of the nb valid replicates — 2 and 63 of 64 whenever no
    replicate zeroed out, which is always at real group sizes), ties
    totally ordered by (mean, replicate id) — zero floating point,
    full value oracle. Toy groups where replicates zero out down to
    nb < 4 get NULL bounds on BOTH sides (r11 advice: rank 2 / rank
    nb−1 invert when nb <= 2 — an inverted CI is worse than an honest
    NULL; mirrored in the oracle and fuzz-tested).

    Scale (100 TB): the 64x row expansion is the bootstrap's honest
    CPU cost, but hashing is now corpus-linear (one md5 per order; the
    64 per-replicate uniforms are ~12 integer ops each inside the same
    whole-stage-codegen pipeline) and it all folds map-side: partial
    aggregation reduces each partition to |groups| x 64 rows before
    the one shuffle, and the rank windows order 64 rows per group.
    State is never B x data — the expansion lives inside a single
    stage. HAVING SUM(w) > 0 guards the degenerate all-zero replicate
    (probability e^-n per group; relevant only to toy fixtures, but
    both engine texts carry the guard so tiny groups cannot diverge).
    """
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.expr(
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    point = base.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(
            "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) div COUNT(*)"
            " AS BIGINT)"
        ).alias("mean_cents"),
    )
    rep = base.select(
        "grp", "cents", "h",
        # sequence of BIGINT literals: b * stride must evaluate in
        # BIGINT (INT b overflows at b=3 under ANSI)
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(_BOOT_B - 1).cast("long")
            )
        ).alias("b"),
    )
    # the mix chain stays in separate Project nodes below the ladder;
    # h itself is computed ONCE per order below the Generate (explode)
    for col, expr in _boot_mix_steps(
        lambda a, b: f"({a} ^ {b})",
        lambda a, n: f"shiftright({a}, {n})",
    ):
        rep = rep.withColumn(col, F.expr(expr))
    rep = rep.select(
        "grp", "b", "cents", F.expr(_boot_w_case("u")).alias("w")
    )
    rm = (
        rep.groupBy("grp", "b")
        .agg(
            F.sum(
                F.col("w").cast("decimal(38,0)")
                * F.col("cents").cast("decimal(38,0)")
            ).alias("num"),
            F.sum(F.col("w").cast("decimal(38,0)")).alias("den"),
        )
        .where(F.col("den") > 0)
        .select(
            "grp",
            "b",
            F.expr("CAST(num div den AS BIGINT)").alias("mean_b"),
        )
    )
    wrk = Window.partitionBy("grp").orderBy("mean_b", "b")
    wnb = Window.partitionBy("grp")
    rk = rm.select(
        "grp",
        "mean_b",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wnb).alias("nb"),
    )
    ci = rk.groupBy("grp").agg(
        F.max(
            F.when(
                (F.col("nb") >= 4) & (F.col("rn") == 2), F.col("mean_b")
            )
        ).alias("boot_lo_cents"),
        F.max(
            F.when(
                (F.col("nb") >= 4) & (F.col("rn") == F.col("nb") - 1),
                F.col("mean_b"),
            )
        ).alias("boot_hi_cents"),
        F.max("nb").cast("long").alias("n_replicates"),
    )
    return point.join(ci, "grp").select(
        "grp",
        "n_orders",
        "mean_cents",
        "boot_lo_cents",
        "boot_hi_cents",
        "n_replicates",
    )


def _delong_oracle() -> str:
    from dbt_repo_spark.operators.evalmetrics import DELONG_AUC, DELONG_SE

    return f"""
    WITH g AS (
      SELECT o_totalprice AS s,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n0
      FROM orders GROUP BY o_totalprice),
    c AS (
      SELECT n1, n0,
             CAST(COALESCE(SUM(n0) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb0,
             CAST(COALESCE(SUM(n1) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb1
      FROM g),
    tot AS (SELECT CAST(SUM(n1) AS HUGEINT) AS m,
                   CAST(SUM(n0) AS HUGEINT) AS n,
                   CAST(SUM(CAST(n1 AS HUGEINT)
                            * (2 * CAST(cb0 AS HUGEINT) + n0))
                        AS HUGEINT) AS a_num
            FROM c),
    dev AS (
      SELECT n1, n0, m, n, a_num,
             m * (2 * CAST(cb0 AS HUGEINT) + n0) - a_num AS d10,
             n * CAST(2 * (m - cb1 - n1) + n1 AS HUGEINT) - a_num AS d01,
             2 * m * n AS mn2
      FROM c CROSS JOIN tot),
    e AS (
      SELECT n1, n0, m, n, a_num,
             CASE WHEN d10 >= 0 THEN (d10 * 1000000) // mn2
                  ELSE -(((-d10) * 1000000) // mn2) END AS e10,
             CASE WHEN d01 >= 0 THEN (d01 * 1000000) // mn2
                  ELSE -(((-d01) * 1000000) // mn2) END AS e01
      FROM dev),
    agg AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m_pos,
             CAST(MAX(n) AS BIGINT) AS n_neg,
             CAST(MAX(a_num) AS BIGINT) AS auc_num,
             SUM(CAST(n1 AS HUGEINT) * e10 * e10) AS t10,
             SUM(CAST(n0 AS HUGEINT) * e01 * e01) AS t01
      FROM e),
    fl AS (SELECT m_pos, n_neg, auc_num,
                  {DELONG_AUC} AS auc_d, {DELONG_SE} AS se_d
           FROM agg)
    SELECT m_pos, n_neg, auc_num,
           CAST(round(auc_d * 1000000, 0) AS BIGINT) AS auc_micros,
           CAST(round(se_d * 1000000, 0) AS BIGINT) AS se_micros,
           CAST(round((auc_d - 1.96 * se_d) * 1000000, 0) AS BIGINT)
             AS ci_lo_micros,
           CAST(round((auc_d + 1.96 * se_d) * 1000000, 0) AS BIGINT)
             AS ci_hi_micros
    FROM fl
    """


@q("eval_auc_delong_ci", _delong_oracle())
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong 95% CI for the ROC-AUC of order value vs order failure —
    the closed-form uncertainty the eval family's point AUC
    (`eval_auc_roc`, SAME fixture: auc_num/m/n cross-check row for row)
    lacked, and the analytic sibling of `eval_bootstrap_ci_mean`'s
    resampling CI. See `operators/evalmetrics.py::delong_auc_ci` for
    the structural-component derivation, the sign-magnitude micro
    quantization that keeps the variance sums exact-integer on both
    engines, and the shared float-tail text.
    """
    from dbt_repo_spark.operators.evalmetrics import delong_auc_ci

    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", (F.col("o_orderstatus") == "F").alias("y")
    )
    return delong_auc_ci(o, "o_totalprice", "y")
