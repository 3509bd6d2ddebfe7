"""Model-evaluation & feature-engineering query family.

The reference pipeline ends at the mart layer; a training-data engine
also feeds the evaluation side of the loop: did the dataset train a model
that ranks (AUC), is it calibrated (reliability bins), does targeting by
its scores concentrate response (gains/lift), is the source data itself
statistically plausible (Benford), and can categorical features be
encoded without target leakage (leave-one-out)? The family grew to
cover the corpus-report shapes (dup rate, cross-source overlap, Zipf),
the experiment lifecycle (power plan / z-test readout / Wilson-CI
reporting), governance (masked views), and the pre-publish audit
(table diff). Every SQL-expressible query is exact-arithmetic end to
end — integer/decimal aggregation with one final division of identical
operands — and carries a full DuckDB oracle. Even text_pii_spans does
since r08: match OFFSETS have no SQL builtin, but they are derivable
exactly by zipping split-segments with extracted matches and
prefix-summing lengths (see _PII_SPANS_SQL).

Registered into the shared QUERIES/ORACLES maps (imported from
``dbt_repo_spark.queries`` at the bottom of that module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_repo_spark.queries import dec, q, t


@q(
    "eval_auc_roc",
    """
    WITH g AS (
      SELECT o_totalprice AS s,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS n0
      FROM orders GROUP BY o_totalprice),
    c AS (
      SELECT n1, n0,
             CAST(COALESCE(SUM(n0) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
      FROM g)
    SELECT CAST(SUM(n1) AS BIGINT) AS n_pos,
           CAST(SUM(n0) AS BIGINT) AS n_neg,
           CAST(SUM(n1 * (2 * cb + n0)) AS BIGINT) AS auc_num,
           CAST(2 * SUM(n1) * SUM(n0) AS BIGINT) AS auc_den,
           CAST(CAST(SUM(n1 * (2 * cb + n0)) AS BIGINT) AS DOUBLE)
             / CAST(CAST(2 * SUM(n1) * SUM(n0) AS BIGINT) AS DOUBLE) AS auc
    FROM c
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC: does order value rank finished orders?

    Mann-Whitney rank-sum identity over score GROUPS (operators/
    evalmetrics.py::roc_auc): numerator/denominator are exact BIGINTs,
    the one double division is on identical operands — bit-equal to the
    oracle's window formulation. Scale: the prefix sum of negatives runs
    two-phase over range-ordered partitions (no global single-partition
    window; |distinct scores| can be |rows| and it still holds).
    """
    from dbt_repo_spark.operators.evalmetrics import roc_auc

    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", (F.col("o_orderstatus") == "F").alias("y")
    )
    return roc_auc(o, "o_totalprice", "y")


@q(
    "target_encode_loo",
    """
    WITH j AS (
      SELECT o.o_orderkey, c.c_mktsegment AS segment,
             CAST(o.o_totalprice AS DECIMAL(14,2)) AS price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    enc AS (
      SELECT segment, SUM(price) AS seg_sum, COUNT(*) AS seg_cnt
      FROM j GROUP BY segment)
    SELECT j.o_orderkey, j.segment,
           CAST(enc.seg_sum - j.price AS DOUBLE)
             / CAST(NULLIF(enc.seg_cnt - 1, 0) AS DOUBLE) AS loo_enc,
           CAST(enc.seg_cnt AS BIGINT) AS seg_cnt
    FROM j JOIN enc ON j.segment = enc.segment
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe leave-one-out target encoding of a categorical.

    Encodes each order's customer segment by the mean order value of the
    OTHER orders in that segment: enc = (Σ_seg − own)/(n_seg − 1). The
    naive per-row window (AVG OVER segment excluding current) shuffles
    the whole fact by a 5-value key; this shape aggregates once
    (map-side partial, |segments| rows) and broadcast-joins the tiny
    encoding table back — the fact is never shuffled by the skewed key.
    Exact: decimal sums, one double division of identical operands.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", dec("o_totalprice", 14, 2).alias("price")
    )
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "segment", "price"
    )
    enc = j.groupBy("segment").agg(
        F.sum("price").alias("seg_sum"), F.count("*").alias("seg_cnt")
    )
    return j.join(F.broadcast(enc), "segment").select(
        "o_orderkey",
        "segment",
        (
            (F.col("seg_sum") - F.col("price")).cast("double")
            / F.nullif(F.col("seg_cnt") - 1, F.lit(0)).cast("double")
        ).alias("loo_enc"),
        F.col("seg_cnt").cast("long").alias("seg_cnt"),
    )


@q(
    "eval_calibration_bins",
    """
    WITH s AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               % 100000 AS m,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    a AS (
      SELECT m // 10000 AS bin, COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS pos, CAST(SUM(m) AS BIGINT) AS sum_m
      FROM s GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n, pos,
           CAST(sum_m AS DOUBLE) / CAST(n AS DOUBLE) / 100000.0 AS mean_score,
           CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
           ABS(CAST(sum_m AS DOUBLE) / CAST(n AS DOUBLE) / 100000.0
               - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS abs_gap
    FROM a
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) bins for a pseudo-probability score.

    The "model score" is the fractional [0,1) part of order value over
    $1000, derived in EXACT integer cents (decimal→cents→mod — never
    float fmod, which rounds differently per libm). Ten equal-width bins
    report mean predicted score vs observed positive rate and their
    absolute gap — the per-bin terms of expected calibration error. One
    map-side-partial groupBy over 10 keys; every ratio divides exact
    operands in mirrored order.
    """
    o = t(spark, sf_dir, "orders").select(
        F.pmod((dec("o_totalprice", 14, 2) * 100).cast("long"), F.lit(100000)).alias(
            "m"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    a = o.groupBy(F.expr("m div 10000").alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("m").cast("long").alias("sum_m"),
    )
    mean_score = F.col("sum_m").cast("double") / F.col("n").cast("double") / F.lit(
        100000.0
    )
    pos_rate = F.col("pos").cast("double") / F.col("n").cast("double")
    return a.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        "pos",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        F.abs(mean_score - pos_rate).alias("abs_gap"),
    )


@q(
    "benford_audit",
    """
    WITH d AS (
      SELECT CAST(regexp_extract(
               CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR),
               '[1-9]') AS INTEGER) AS digit
      FROM orders),
    a AS (SELECT digit, COUNT(*) AS obs FROM d GROUP BY digit),
    e AS (
      SELECT digit, obs,
             -- E-notation: DuckDB parses plain decimal literals as
             -- DECIMAL and its DECIMAL->DOUBLE conversion double-rounds
             -- (int/10^k in float) — an exponent forces a true DOUBLE
             -- literal, bit-identical to Spark's parse
             CASE digit
               WHEN 1 THEN 3.010299956639812e-1 WHEN 2 THEN 1.7609125905568124e-1
               WHEN 3 THEN 1.2493873660829993e-1 WHEN 4 THEN 9.691001300805642e-2
               WHEN 5 THEN 7.918124604762482e-2 WHEN 6 THEN 6.694678963061322e-2
               WHEN 7 THEN 5.799194697768673e-2 WHEN 8 THEN 5.115252244738129e-2
               WHEN 9 THEN 4.575749056067514e-2 END AS expected_p,
             CAST(SUM(obs) OVER () AS BIGINT) AS total
      FROM a)
    SELECT digit, obs, expected_p,
           CAST(total AS DOUBLE) * expected_p AS expected_n,
           (CAST(obs AS DOUBLE) - CAST(total AS DOUBLE) * expected_p)
             * (CAST(obs AS DOUBLE) - CAST(total AS DOUBLE) * expected_p)
             / (CAST(total AS DOUBLE) * expected_p) AS chi2_term
    FROM e
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order values (fraud/synthetic-data
    smell test, the data-quality shape auditors actually run).

    The leading significant digit comes from the DECIMAL STRING form
    (regexp first [1-9]) — never floor(log10(x)), where a libm ulp at a
    power of ten flips the digit across engines. Expected proportions are
    log10(1+1/d) literals; χ² terms are (obs−np)²/np with the identical
    IEEE sequence both sides. The window total runs over the 9-row digit
    relation (bounded regardless of fact size).
    """
    o = t(spark, sf_dir, "orders").select(
        F.regexp_extract(
            dec("o_totalprice", 14, 2).cast("string"), "[1-9]", 0
        )
        .cast("int")
        .alias("digit")
    )
    a = o.groupBy("digit").agg(F.count("*").alias("obs"))
    benford = {
        1: 0.3010299956639812,
        2: 0.17609125905568124,
        3: 0.12493873660829993,
        4: 0.09691001300805642,
        5: 0.07918124604762482,
        6: 0.06694678963061322,
        7: 0.05799194697768673,
        8: 0.05115252244738129,
        9: 0.04575749056067514,
    }
    p = F.lit(None).cast("double")
    expr = None
    for dgt, prob in benford.items():
        expr = (
            F.when(F.col("digit") == dgt, F.lit(prob))
            if expr is None
            else expr.when(F.col("digit") == dgt, F.lit(prob))
        )
    p = expr
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e = a.select(
        "digit",
        "obs",
        p.alias("expected_p"),
        F.sum("obs").over(wt).cast("long").alias("total"),
    )
    exp_n = F.col("total").cast("double") * F.col("expected_p")
    diff = F.col("obs").cast("double") - exp_n
    return e.select(
        "digit",
        "obs",
        "expected_p",
        exp_n.alias("expected_n"),
        (diff * diff / exp_n).alias("chi2_term"),
    )


@q(
    "ks_two_sample_price",
    """
    WITH g AS (
      SELECT o_totalprice AS s,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM orders GROUP BY o_totalprice),
    c AS (
      SELECT s, CAST(SUM(a) OVER (ORDER BY s) AS BIGINT) AS ca,
             CAST(SUM(b) OVER (ORDER BY s) AS BIGINT) AS cb
      FROM g),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
            FROM g),
    d AS (SELECT s, n_a, n_b,
                 ABS(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)
                     - CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) AS diff
          FROM c, tot),
    dm AS (SELECT MAX(diff) AS d_stat FROM d)
    SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b, MAX(dm.d_stat) AS d_stat,
           MIN(s) AS at_value
    FROM d, dm WHERE d.diff = dm.d_stat
    """,
)
def ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov: do finished and open orders
    draw their values from the same distribution?

    D evaluated at every distinct value via two-phase prefix sums
    (operators/evalmetrics.py::ks_two_sample — never a global
    single-partition window); every CDF ratio divides exact BIGINTs so
    the max and its argmin location are bit-deterministic. The classic
    drift test PSI (psi_value_drift) bins first; KS is the exact
    bin-free complement.
    """
    from dbt_repo_spark.operators.evalmetrics import ks_two_sample

    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", (F.col("o_orderstatus") == "F").alias("ga")
    )
    return ks_two_sample(o, "o_totalprice", "ga")


@q(
    "feature_corr_matrix",
    """
    WITH a AS (
      SELECT CAST(COUNT(*) AS DECIMAL(12,0)) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(19,2)) AS s_q,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(19,2)) AS s_e,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(19,2)) AS s_d,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS s_qq,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(24,4)) AS s_ee,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS s_dd,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(24,4)) AS s_qe,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS s_qd,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS s_ed
      FROM lineitem),
    pairs AS (SELECT * FROM (VALUES ('quantity','extendedprice'),
                                    ('quantity','discount'),
                                    ('extendedprice','discount')) AS p(fx, fy)),
    k AS (
      SELECT fx, fy, n,
        CASE fx WHEN 'quantity' THEN s_q WHEN 'extendedprice' THEN s_e ELSE s_d END AS sx,
        CASE fy WHEN 'quantity' THEN s_q WHEN 'extendedprice' THEN s_e ELSE s_d END AS sy,
        CASE fx WHEN 'quantity' THEN s_qq WHEN 'extendedprice' THEN s_ee ELSE s_dd END AS sxx,
        CASE fy WHEN 'quantity' THEN s_qq WHEN 'extendedprice' THEN s_ee ELSE s_dd END AS syy,
        CASE WHEN fx = 'quantity' AND fy = 'extendedprice' THEN s_qe
             WHEN fx = 'quantity' AND fy = 'discount' THEN s_qd
             ELSE s_ed END AS sxy
      FROM pairs, a)
    SELECT fx, fy, CAST(n AS BIGINT) AS n,
      CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        / NULLIF(sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                 * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)), 0.0) AS corr
    FROM k
    """,
)
def feature_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Pearson correlation matrix over lineitem numerics.

    One scan, one map-side-partial aggregate row carrying every moment
    (n, Σx, Σx², Σxy) as DECIMAL-exact sums; the 3-pair matrix unfolds
    by cross-joining the 1-row aggregate to a literal pair relation —
    the fact is never re-scanned per pair. corr = (nΣxy−ΣxΣy)/
    (√(nΣx²−Σx²)·√(nΣy²−Σy²)) where both operands of every transcendental-
    free step are exact decimals cast once to double; sqrt is IEEE
    correctly-rounded, so the result is bit-equal across engines.
    Precisions are sized for ~10⁹-row facts (values ≤1e5: Σxy ≤ 1e19 <
    DECIMAL(24,4)); at true 100 TB row counts, widen to (30,4) — still
    inside DECIMAL(38) after the n· products.
    """
    li = t(spark, sf_dir, "lineitem")
    dq = dec("l_quantity", 12, 2)
    de = dec("l_extendedprice", 14, 2)
    dd = dec("l_discount", 12, 2)
    a = li.agg(
        F.count("*").cast("decimal(12,0)").alias("n"),
        F.sum(dq).cast("decimal(18,2)").alias("s_q"),
        F.sum(de).cast("decimal(18,2)").alias("s_e"),
        F.sum(dd).cast("decimal(18,2)").alias("s_d"),
        F.sum(dq * dq).cast("decimal(24,4)").alias("s_qq"),
        F.sum(de * de).cast("decimal(24,4)").alias("s_ee"),
        F.sum(dd * dd).cast("decimal(24,4)").alias("s_dd"),
        F.sum(dq * de).cast("decimal(24,4)").alias("s_qe"),
        F.sum(dq * dd).cast("decimal(24,4)").alias("s_qd"),
        F.sum(de * dd).cast("decimal(24,4)").alias("s_ed"),
    )
    pairs = spark.createDataFrame(
        [
            ("quantity", "extendedprice"),
            ("quantity", "discount"),
            ("extendedprice", "discount"),
        ],
        ["fx", "fy"],
    )
    pick_s = lambda c: (  # noqa: E731
        F.when(c == "quantity", F.col("s_q"))
        .when(c == "extendedprice", F.col("s_e"))
        .otherwise(F.col("s_d"))
    )
    pick_sq = lambda c: (  # noqa: E731
        F.when(c == "quantity", F.col("s_qq"))
        .when(c == "extendedprice", F.col("s_ee"))
        .otherwise(F.col("s_dd"))
    )
    sxy = (
        F.when(
            (F.col("fx") == "quantity") & (F.col("fy") == "extendedprice"),
            F.col("s_qe"),
        )
        .when(
            (F.col("fx") == "quantity") & (F.col("fy") == "discount"), F.col("s_qd")
        )
        .otherwise(F.col("s_ed"))
    )
    k = pairs.crossJoin(F.broadcast(a)).select(
        "fx",
        "fy",
        "n",
        pick_s(F.col("fx")).alias("sx"),
        pick_s(F.col("fy")).alias("sy"),
        pick_sq(F.col("fx")).alias("sxx"),
        pick_sq(F.col("fy")).alias("syy"),
        sxy.alias("sxy"),
    )
    # DECIMAL -> STRING -> DOUBLE: a decimal whose unscaled value
    # exceeds 2^53 double-rounds under DuckDB's direct int/10^k
    # conversion; the string parse is correctly rounded in BOTH engines,
    # so this route is bit-deterministic at any magnitude
    num = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    vx = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("string")
        .cast("double")
    )
    vy = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    return k.select(
        "fx",
        "fy",
        F.col("n").cast("long").alias("n"),
        (num / F.nullif(vx * vy, F.lit(0.0))).alias("corr"),
    )


@q(
    "mutual_info_cells",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderstatus AS status
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cells AS (SELECT seg, status, COUNT(*) AS c_xy FROM j GROUP BY 1, 2),
    w AS (
      SELECT seg, status, c_xy,
             CAST(SUM(c_xy) OVER (PARTITION BY seg) AS BIGINT) AS c_x,
             CAST(SUM(c_xy) OVER (PARTITION BY status) AS BIGINT) AS c_y,
             CAST(SUM(c_xy) OVER () AS BIGINT) AS n
      FROM cells)
    SELECT seg, status, c_xy, c_x, c_y, n,
           round(ln(CAST(c_xy * n AS DOUBLE) / CAST(c_x * c_y AS DOUBLE)), 6)
             AS pmi,
           round((CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(c_xy * n AS DOUBLE) / CAST(c_x * c_y AS DOUBLE)), 6)
             AS mi_term
    FROM w
    """,
)
def mutual_info_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information cells between customer segment and
    order status — the feature-relevance shape (MI feature ranking).

    Marginals and the total come from windows over the |segments|×
    |statuses| cell relation (15 rows — bounded regardless of fact
    size); the fact itself is aggregated once. ln() is the one libm
    call: its operand is an exact-integer ratio (identical bits both
    engines) and the result is rounded to 6 dp to absorb last-ulp libm
    differences, per the repo-wide transcendental rule. Per-cell terms
    are emitted instead of a cross-cell float sum (order-dependent);
    MI itself is the exact-decimal fold downstream consumers apply.
    """
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderstatus").alias("status")
    )
    cells = j.groupBy("seg", "status").agg(F.count("*").alias("c_xy"))
    wx = Window.partitionBy("seg")
    wy = Window.partitionBy("status")
    wt = Window.partitionBy()
    w = cells.select(
        "seg",
        "status",
        "c_xy",
        F.sum("c_xy").over(wx).cast("long").alias("c_x"),
        F.sum("c_xy").over(wy).cast("long").alias("c_y"),
        F.sum("c_xy").over(wt).cast("long").alias("n"),
    )
    r = (F.col("c_xy") * F.col("n")).cast("double") / (
        F.col("c_x") * F.col("c_y")
    ).cast("double")
    return w.select(
        "seg",
        "status",
        "c_xy",
        "c_x",
        "c_y",
        "n",
        F.round(F.log(r), 6).alias("pmi"),
        F.round(
            (F.col("c_xy").cast("double") / F.col("n").cast("double")) * F.log(r), 6
        ).alias("mi_term"),
    )


@q(
    "daily_revenue_autocorr",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(19,2)) AS x
      FROM orders GROUP BY 1),
    lg AS (
      SELECT x, LAG(x, 1) OVER (ORDER BY d) AS x1,
             LAG(x, 7) OVER (ORDER BY d) AS x7
      FROM daily),
    m AS (
      SELECT
        CAST(COUNT(x1) AS DECIMAL(12,0)) AS n_1,
        CAST(COALESCE(SUM(x)  FILTER (x1 IS NOT NULL), 0) AS DECIMAL(19,2)) AS sx_1,
        CAST(COALESCE(SUM(x1), 0) AS DECIMAL(19,2)) AS sy_1,
        CAST(COALESCE(SUM(x * x) FILTER (x1 IS NOT NULL), 0) AS DECIMAL(24,4)) AS sxx_1,
        CAST(COALESCE(SUM(x1 * x1), 0) AS DECIMAL(24,4)) AS syy_1,
        CAST(COALESCE(SUM(x * x1),  0) AS DECIMAL(24,4)) AS sxy_1,
        CAST(COUNT(x7) AS DECIMAL(12,0)) AS n_7,
        CAST(COALESCE(SUM(x)  FILTER (x7 IS NOT NULL), 0) AS DECIMAL(19,2)) AS sx_7,
        CAST(COALESCE(SUM(x7), 0) AS DECIMAL(19,2)) AS sy_7,
        CAST(COALESCE(SUM(x * x)   FILTER (x7 IS NOT NULL), 0) AS DECIMAL(24,4)) AS sxx_7,
        CAST(COALESCE(SUM(x7 * x7), 0) AS DECIMAL(24,4)) AS syy_7,
        CAST(COALESCE(SUM(x * x7),  0) AS DECIMAL(24,4)) AS sxy_7
      FROM lg),
    lags AS (SELECT * FROM (VALUES (1), (7)) AS l(lag)),
    k AS (
      SELECT lag,
        CASE lag WHEN 1 THEN n_1   ELSE n_7   END AS n,
        CASE lag WHEN 1 THEN sx_1  ELSE sx_7  END AS sx,
        CASE lag WHEN 1 THEN sy_1  ELSE sy_7  END AS sy,
        CASE lag WHEN 1 THEN sxx_1 ELSE sxx_7 END AS sxx,
        CASE lag WHEN 1 THEN syy_1 ELSE syy_7 END AS syy,
        CASE lag WHEN 1 THEN sxy_1 ELSE sxy_7 END AS sxy
      FROM lags, m)
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n,
      CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        / NULLIF(sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                 * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)), 0.0) AS autocorr
    FROM k
    """,
)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily revenue series — the
    seasonality-detection shape that decides whether seasonal_naive or
    holt_linear is the right forecaster.

    The fact reduces to |days| rows (calendar-bounded — the lag window
    over it is single-partition by construction and stays ~2.4k rows at
    any corpus size, same justification as the KM curve). Pearson over
    (x_t, x_{t−k}) pairs uses DECIMAL-exact conditional moments (FILTER
    on lag-presence so both series see identical support), one double
    cast per term, IEEE sqrt — bit-deterministic. Both lags unfold from
    ONE moment row via a literal cross join; the daily series is scanned
    once.
    """
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice", 14, 2)).cast("decimal(18,2)").alias("x"))
    )
    w = Window.orderBy("d")
    lg = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )

    def moments(lag_col: str, suffix: str) -> list:
        has = F.col(lag_col).isNotNull()
        # Spark caps decimal precision at 38 on multiply (p1+p2+1), so
        # sums that get squared stay at (18,2) here; the ORACLE casts the
        # same sums to (19,2) because DuckDB multiplies DECIMAL(18) in
        # int64 and overflows — both are exact, values identical.
        z2 = F.lit(0).cast("decimal(18,2)")
        z4 = F.lit(0).cast("decimal(24,4)")
        xc, lc = F.col("x"), F.col(lag_col)
        return [
            F.count(lag_col).cast("decimal(12,0)").alias(f"n_{suffix}"),
            F.coalesce(F.sum(F.when(has, xc)), z2)
            .cast("decimal(18,2)")
            .alias(f"sx_{suffix}"),
            F.coalesce(F.sum(lc), z2).cast("decimal(18,2)").alias(f"sy_{suffix}"),
            F.coalesce(F.sum(F.when(has, xc * xc)), z4)
            .cast("decimal(24,4)")
            .alias(f"sxx_{suffix}"),
            F.coalesce(F.sum(lc * lc), z4)
            .cast("decimal(24,4)")
            .alias(f"syy_{suffix}"),
            F.coalesce(F.sum(xc * lc), z4)
            .cast("decimal(24,4)")
            .alias(f"sxy_{suffix}"),
        ]

    m = lg.agg(*(moments("x1", "1") + moments("x7", "7")))
    lags = spark.createDataFrame([(1,), (7,)], ["lag"])
    pick = lambda base: F.when(  # noqa: E731
        F.col("lag") == 1, F.col(f"{base}_1")
    ).otherwise(F.col(f"{base}_7"))
    k = lags.crossJoin(F.broadcast(m)).select(
        "lag",
        pick("n").alias("n"),
        pick("sx").alias("sx"),
        pick("sy").alias("sy"),
        pick("sxx").alias("sxx"),
        pick("syy").alias("syy"),
        pick("sxy").alias("sxy"),
    )
    # DECIMAL -> STRING -> DOUBLE: a decimal whose unscaled value
    # exceeds 2^53 double-rounds under DuckDB's direct int/10^k
    # conversion; the string parse is correctly rounded in BOTH engines,
    # so this route is bit-deterministic at any magnitude
    num = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    vx = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("string")
        .cast("double")
    )
    vy = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    return k.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n"),
        (num / F.nullif(vx * vy, F.lit(0.0))).alias("autocorr"),
    )


@q(
    "ab_test_proportions",
    """
    WITH conv AS (
      SELECT c.c_mktsegment AS seg,
             MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS converted
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY c.c_custkey, c.c_mktsegment),
    m AS (
      SELECT
        CAST(COUNT(*) FILTER (seg = 'BUILDING') AS BIGINT) AS n_a,
        CAST(COALESCE(SUM(converted) FILTER (seg = 'BUILDING'), 0) AS BIGINT) AS x_a,
        CAST(COUNT(*) FILTER (seg = 'MACHINERY') AS BIGINT) AS n_b,
        CAST(COALESCE(SUM(converted) FILTER (seg = 'MACHINERY'), 0) AS BIGINT) AS x_b
      FROM conv)
    SELECT n_a, x_a, n_b, x_b,
      CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
      CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
      (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z
    FROM m
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the A/B experiment readout shape
    (conversion = customer has a finished order; arms = two segments).

    Customers reduce to one converted-flag row each (keyed shuffle),
    then ONE conditional-count row feeds the pooled-variance z statistic:
    every input to the formula is an exact BIGINT, each division/sqrt is
    IEEE-correctly-rounded on identical operands in mirrored order, so
    the statistic matches the oracle bit-for-bit. Complements
    welch_ttest (means) and ks_two_sample (distributions).
    """
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    conv = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("converted")
        )
        .select(F.col("c_mktsegment").alias("seg"), "converted")
    )
    is_a = F.col("seg") == "BUILDING"
    is_b = F.col("seg") == "MACHINERY"
    m = conv.agg(
        F.count(F.when(is_a, 1)).cast("long").alias("n_a"),
        F.coalesce(F.sum(F.when(is_a, F.col("converted"))), F.lit(0))
        .cast("long")
        .alias("x_a"),
        F.count(F.when(is_b, 1)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(is_b, F.col("converted"))), F.lit(0))
        .cast("long")
        .alias("x_b"),
    )
    rate_a = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    rate_b = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (rate_a - rate_b) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return m.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        z.alias("z"),
    )


@q(
    "table_diff_orders",
    """
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 83 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0),
    j AS (
      SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
             a.o_totalprice AS pa, b.o_totalprice AS pb,
             a.o_orderstatus AS sa, b.o_orderstatus AS sb
      FROM orders a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
    SELECT
      CAST(SUM(CASE WHEN ka IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      CAST(SUM(CASE WHEN kb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      CAST(SUM(CASE WHEN kb IS NOT NULL AND ka IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
      CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
      CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                     AND (pa IS DISTINCT FROM pb OR sa IS DISTINCT FROM sb)
               THEN 1 ELSE 0 END) AS BIGINT) AS changed,
      CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                     AND pa IS NOT DISTINCT FROM pb
                     AND sa IS NOT DISTINCT FROM sb
               THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
      CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                     AND pa IS DISTINCT FROM pb THEN 1 ELSE 0 END) AS BIGINT)
        AS changed_o_totalprice,
      CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                     AND sa IS DISTINCT FROM sb THEN 1 ELSE 0 END) AS BIGINT)
        AS changed_o_orderstatus
    FROM j
    """,
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed data-diff between a table and its next version — the
    pre-publish audit report (what did this deploy add/remove/change,
    and in which columns?).

    The "v2" side is a deterministic synthetic mutation of orders
    (drop every 97th key, bump price on every 89th, flip status on
    every 83rd, append a shifted copy of every 101st) so the diff
    operator (operators/relational.py::table_diff) has known ground
    truth in both engines. One full-outer key join, conditional-count
    aggregation, exact BIGINTs throughout.
    """
    from dbt_repo_spark.operators.relational import table_diff

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    keep = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 83 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    extra = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    v2 = keep.unionByName(extra)
    return table_diff(
        o, v2, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


@q(
    "zipf_token_fit",
    """
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS term
      FROM documents),
    freq AS (SELECT term, COUNT(*) AS f FROM tok GROUP BY term),
    vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size FROM freq),
    rk AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term ASC) AS r
           FROM freq),
    pts AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
             CAST(round(ln(CAST(f AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
      FROM rk WHERE r <= 500 AND f >= 5),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(x) AS DECIMAL(14,6)) AS sx,
             CAST(SUM(y) AS DECIMAL(14,6)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(20,12)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(20,12)) AS sxx
      FROM pts)
    SELECT CAST(n AS BIGINT) AS n_fit, vocab_size,
      CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS slope,
      (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
       - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
          / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
         * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
        / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS intercept
    FROM m, vs
    """,
)
def zipf_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus token-frequency distribution — the
    corpus-QA shape (natural text fits slope ≈ −1 on log rank vs log
    freq; synthetic or template-heavy data departs visibly).

    Frequency ranking avoids the global single-partition window: ranks
    come from ``dense_ids`` over a composite sortable key (zero-padded
    inverted frequency ‖ term), i.e. the two-phase range rank — the
    ranking scales to any vocabulary. The OLS fit runs on the top-500
    (rank, freq) points: ln() outputs round to 6 dp (libm rule), the
    moments are exact DECIMAL sums, and the >2⁵³ unscaled intermediates
    reach double through the VARCHAR route.
    """
    from dbt_repo_spark.operators import dedup
    from dbt_repo_spark.operators.ids import dense_ids

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(dedup.tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").alias("f"))
    key = F.format_string(
        "%012d|%s", F.lit(999999999999) - F.col("f"), F.col("term")
    )
    keyed = freq.select(F.col("f"), key.alias("k"))
    ranked = keyed.join(dense_ids(keyed.select("k"), "k", id_col="r0"), "k").select(
        "f", (F.col("r0") + 1).alias("r")
    )
    vs = freq.agg(F.count("*").cast("long").alias("vocab_size"))
    pts = ranked.filter((F.col("r") <= 500) & (F.col("f") >= 5)).select(
        F.round(F.log(F.col("r").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum("x").cast("decimal(14,6)").alias("sx"),
        F.sum("y").cast("decimal(14,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(20,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(20,12)").alias("sxx"),
    )
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = s2d(num) / s2d(den)
    return m.crossJoin(F.broadcast(vs)).select(
        F.col("n").cast("long").alias("n_fit"),
        "vocab_size",
        slope.alias("slope"),
        ((s2d(F.col("sy")) - slope * s2d(F.col("sx"))) / s2d(F.col("n"))).alias(
            "intercept"
        ),
    )


@q(
    "dup_rate_by_source",
    """
    WITH h AS (
      SELECT source, md5(text) AS sig FROM documents),
    a AS (
      SELECT source, COUNT(*) AS n_docs,
             COUNT(DISTINCT sig) AS n_distinct
      FROM h GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_docs - n_distinct AS BIGINT) AS n_dup_docs,
           CAST(n_docs - n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS dup_rate
    FROM a
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate rate per corpus source — the per-feed line of a
    corpus quality report (which crawl/source is flooding the dataset
    with copies?). Content identity is the md5 signature (16-byte
    shuffle key, the dedup_exact rule); one groupBy with a distinct
    aggregate, exact-integer ratio. Feeds the dedup pipeline's
    before/after comparison.
    """
    docs = t(spark, sf_dir, "documents")
    h = docs.select("source", F.md5(F.col("text")).alias("sig"))
    a = h.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("sig").alias("n_distinct"),
    )
    return a.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        (F.col("n_docs") - F.col("n_distinct")).cast("long").alias("n_dup_docs"),
        (
            (F.col("n_docs") - F.col("n_distinct")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


@q(
    "masked_customer_view",
    """
    SELECT md5(CAST(c_custkey AS VARCHAR)) AS c_custkey,
           '***' AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           c_mktsegment,
           '***' || substring(CAST(c_custkey AS VARCHAR),
                              length(CAST(c_custkey AS VARCHAR)) - 1, 2)
             AS custkey_display
    FROM customer
    """,
)
def masked_customer_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed export view of the customer dimension: every masking
    strategy exercised in one relation — keyed md5 surrogate (joins and
    dedup still work), redaction, typed NULLs (schema-stable), and
    partial display (last 2 chars). Pure projection: scan-speed, no
    shuffle, and the restricted consumer reads the same physical table
    as the privileged one (plans/governance.py::mask_columns).
    """
    from dbt_repo_spark.plans.governance import mask_columns

    c = t(spark, sf_dir, "customer").withColumn(
        "custkey_display", F.col("c_custkey")
    )
    return mask_columns(
        c,
        {
            "c_custkey": "hash",
            "c_name": "redact",
            "c_nationkey": "null",
            "c_acctbal": "null",
            "custkey_display": "partial:2",
        },
    )


# ---------------------------------------------------------------------
# text_pii_spans FULL oracle (r08): regex match OFFSETS have no direct
# SQL builtin in either engine, but they are DERIVABLE exactly — zip
# string_split_regex (the between-match segments, in order) with
# regexp_extract_all (the matches, in order) and prefix-sum the lengths.
# Precedence is reproduced by REBUILDING the same-length-masked text
# between classes (chr(1) runs — inert for every pattern class and a
# non-word char exactly like the Python \x00 mask, so \b behaves
# identically). This retires the registry's LAST rows-only row.
# ---------------------------------------------------------------------
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d[\d ]{6,14}\d"

def _pii_stage(c, pat, prev):
    return f"""
    {c}_parts AS (
      SELECT doc_id, string_split_regex(m, '{pat}') AS segs,
             regexp_extract_all(m, '{pat}') AS ms
      FROM {prev}),
    {c}_rows AS (
      SELECT doc_id, i, ms[i] AS mt, length(ms[i]) AS mlen,
             length(segs[i]) AS slen
      FROM {c}_parts, UNNEST(range(1, len(ms) + 1)) AS u(i)),
    {c}_spans AS (
      SELECT doc_id, '{c}' AS span_type,
             CAST(SUM(slen) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS UNBOUNDED PRECEDING)
                  + COALESCE(SUM(mlen) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS INTEGER) AS start,
             CAST(mlen AS INTEGER) AS mlen, mt
      FROM {c}_rows),
    {c}_masked AS (
      SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS m
      FROM (
        SELECT doc_id, 0 AS ord, segs[1] AS piece FROM {c}_parts
        UNION ALL
        SELECT doc_id, 2*i - 1, repeat(chr(1), length(ms[i]))
        FROM {c}_parts, UNNEST(range(1, len(ms) + 1)) AS u(i)
        UNION ALL
        SELECT doc_id, 2*i, segs[i + 1]
        FROM {c}_parts, UNNEST(range(1, len(ms) + 1)) AS u(i)
      ) GROUP BY doc_id)"""

_PII_SPANS_SQL = f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7 call +47 2255 01'
                    || CAST(doc_id % 10 AS VARCHAR) || CAST(doc_id % 7 AS VARCHAR)
             ELSE text END AS text
      FROM documents WHERE text IS NOT NULL),
    m0 AS (SELECT doc_id, text AS m FROM base),
    {_pii_stage("email", _PII_EMAIL, "m0")},
    {_pii_stage("ipv4", _PII_IPV4, "email_masked")},
    {_pii_stage("phone", _PII_PHONE, "ipv4_masked")},
    spans AS (
      SELECT * FROM email_spans
      UNION ALL SELECT * FROM ipv4_spans
      UNION ALL SELECT * FROM phone_spans),
    jvm AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
             CAST(len(regexp_extract_all(
               regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_IPV4}', '<IP>', 'g'),
               '{_PII_PHONE}')) AS BIGINT) AS n_phone
      FROM base),
    jvm_long AS (
      SELECT doc_id, 'email' AS span_type, n_email AS n_jvm FROM jvm
      UNION ALL SELECT doc_id, 'ipv4', n_ipv4 FROM jvm
      UNION ALL SELECT doc_id, 'phone', n_phone FROM jvm),
    py_counts AS (
      SELECT doc_id, span_type, COUNT(*) AS n_py FROM spans GROUP BY 1, 2)
    SELECT s.doc_id, s.span_type, s.start,
           CAST(s.start + s.mlen AS INTEGER) AS "end",
           substr(b.text, s.start + 1, s.mlen) AS span_text,
           substr(b.text, s.start + 1, s.mlen) = s.mt AS span_matches_text,
           substr(b.text, s.start + 1, s.mlen) = s.mt AS jvm_slice_match,
           pc.n_py = COALESCE(j.n_jvm, -1) AS class_count_match
    FROM spans s
    JOIN base b ON b.doc_id = s.doc_id
    JOIN py_counts pc ON pc.doc_id = s.doc_id AND pc.span_type = s.span_type
    LEFT JOIN jvm_long j ON j.doc_id = s.doc_id AND j.span_type = s.span_type
"""


@q("text_pii_spans", _PII_SPANS_SQL)
def text_pii_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-offset PII spans over the documents table — the
    span-labeling training-data shape (NER targets, surgical redaction
    audit trails). Inputs are seeded with the SAME deterministic
    email/IP/phone suffix as text_pii_redaction (the synthetic corpus
    carries no organic PII — non-vacuous by construction).

    FULL oracle since r08 (this was the registry's last rows-only
    row): no SQL builtin exposes match offsets, but they are DERIVABLE
    exactly — the DuckDB twin zips string_split_regex segments with
    regexp_extract_all matches and prefix-sums their lengths, and
    reproduces the precedence chain by rebuilding the same-length
    chr(1)-masked text between classes. The row ALSO carries three
    independent in-plan certificates (r07 verdict ask #8):

    - ``span_matches_text`` — text[start:end] == span_text inside the
      Python extraction (masked-match vs original-text agreement);
    - ``jvm_slice_match`` — the ENGINE re-slices the original document
      at [start, end) with Catalyst ``substring`` and compares to
      span_text: the offsets are re-verified by a different string
      implementation than the one that produced them;
    - ``class_count_match`` — per (doc, class), the Python span count
      equals ``redact_pii``'s JVM ``regexp_count`` on the
      progressively-redacted text (same precedence chain), promoting
      the redaction-agreement pytest into the hashed row itself.

    A drifted offset, a Python/JVM regex divergence, or a precedence
    change each flip a dedicated column. Full-corpus audit is
    fixture-scale work; at 100 TB the two join-back certificates run on
    a sampled partition, the extraction itself stays scan-shaped.
    """
    from dbt_repo_spark.operators.text import pii_spans, redact_pii

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 call +47 2255 01"),
                (F.col("doc_id") % 10).cast("string"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spans = pii_spans(docs, "doc_id", "text")
    jvm_counts = redact_pii(docs, "doc_id", "text").select(
        "doc_id",
        F.expr(
            "stack(3, 'email', n_email, 'ipv4', n_ipv4, 'phone', n_phone)"
            " AS (span_type, n_jvm)"
        ),
    )
    py_counts = spans.groupBy("doc_id", "span_type").agg(
        F.count("*").alias("n_py")
    )
    return (
        spans.join(docs, "doc_id")
        .withColumn(
            "jvm_slice_match",
            F.expr("substring(text, start + 1, end - start)")
            == F.col("span_text"),
        )
        .join(py_counts, ["doc_id", "span_type"])
        .join(jvm_counts, ["doc_id", "span_type"], "left")
        .withColumn(
            "class_count_match",
            F.col("n_py") == F.coalesce(F.col("n_jvm"), F.lit(-1)),
        )
        .select(
            "doc_id", "span_type", "start", "end", "span_text",
            "span_matches_text", "jvm_slice_match", "class_count_match",
        )
    )


@q(
    "source_overlap_matrix",
    """
    WITH borrowed AS (
      -- seeded cross-source duplicates: every 7th document's text also
      -- appears under the NEXT document's source (usually a different
      -- feed) — the synthetic corpus shares nothing organically, so the
      -- matrix is non-vacuous by construction (mirrored in Spark)
      SELECT d2.source, d1.text
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      WHERE d1.doc_id % 7 = 0),
    corpus AS (
      SELECT source, text FROM documents
      UNION ALL SELECT source, text FROM borrowed),
    sigs AS (
      -- seeded 50% SIGNATURE sample: the pair join keys on sig
      -- equality, so sampling the key space keeps every match inside
      -- the sampled universe (no cross-sample pairs exist to lose) —
      -- first hex digit < '8' is deterministic in both engines
      SELECT DISTINCT source, md5(text) AS sig FROM corpus
      WHERE substr(md5(text), 1, 1) < '8'),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sigs
              GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sigs a JOIN sigs b
        ON a.sig = b.sig AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT p.source_a, p.source_b, sa.n AS n_a, sb.n AS n_b, p.n_common,
           CAST(p.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - p.n_common AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.source_a = sa.source
    JOIN sizes sb ON p.source_b = sb.source
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: how much identical content do
    corpus feeds share? (Two crawls of the same sites inflate a
    training set silently; this is the between-feed line of the dedup
    report, complementing dup_rate_by_source's within-feed line.)

    Distinct (source, md5) pairs self-join on the 16-byte signature —
    the shuffle key is content-uniform (never the skewed source), the
    self-join reuses one exchange, and the |sources|² pair relation
    joins broadcast-sized size lookups. Exact-integer Jaccard over a
    seeded 50% SIGNATURE sample (r03 verdict: the full self-join is
    audit-strength work at 100 TB). Sampling the JOIN KEY space — md5
    first hex digit < '8', deterministic and engine-independent — keeps
    every match inside the sampled universe, so per-pair Jaccard is a
    consistent content-uniform estimate (a ratio of sampled counts —
    asymptotically unbiased, not exactly unbiased;
    test_source_overlap_sampling pins it against the exact matrix on
    the seeded fixture overlap).
    """
    docs = t(spark, sf_dir, "documents")
    d1 = docs.select("doc_id", "text").filter(F.col("doc_id") % 7 == 0)
    d2 = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("source")
    )
    borrowed = d1.join(d2, "doc_id").select("source", "text")
    corpus = docs.select("source", "text").unionByName(borrowed)
    # one corpus scan: sigs feeds three consumers (both self-join sides
    # and the size lookup) — materialize it once instead of recomputing
    # the union+distinct per consumer
    sigs = (
        corpus.select("source", F.md5(F.col("text")).alias("sig"))
        .filter(F.substring("sig", 1, 1) < "8")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sigs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


@q(
    "ab_test_power_plan",
    """
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM orders),
    lifts AS (SELECT * FROM (VALUES (5.0e-2), (1.0e-1), (2.0e-1))
              AS l(rel_lift)),
    k AS (
      SELECT rel_lift,
             CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
             (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 + rel_lift) AS p2
      FROM lifts, base)
    SELECT rel_lift, p1, p2,
      CAST(ceil(
        power(1.959963984540054
                * sqrt(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
              + 0.8416212335729143
                * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2.0)
        / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
    FROM k
    """,
)
def ab_test_power_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planner — the DESIGN side of the A/B
    family (ab_test_proportions is the readout): per relative lift,
    how many subjects per arm detect it at α=0.05 / 80% power, anchored
    on the OBSERVED baseline conversion rate? Standard two-proportion
    normal-approximation formula; z quantiles are double literals
    (E-notation rule), the baseline rate divides exact BIGINTs, and
    sqrt/power(·,2)/ceil are correctly-rounded on identical operands in
    mirrored order — deterministic across engines. One aggregate row
    fans out to the 3-row lift grid via a literal cross join.
    """
    o = t(spark, sf_dir, "orders")
    base = o.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    lifts = spark.createDataFrame([(0.05,), (0.10,), (0.20,)], ["rel_lift"])
    p1 = F.col("x").cast("double") / F.col("n").cast("double")
    k = lifts.crossJoin(F.broadcast(base)).select(
        "rel_lift",
        p1.alias("p1"),
        (p1 * (F.lit(1.0) + F.col("rel_lift"))).alias("p2"),
    )
    pbar = (F.col("p1") + F.col("p2")) / F.lit(2.0)
    num = F.pow(
        F.lit(1.959963984540054)
        * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar))
        + F.lit(0.8416212335729143)
        * F.sqrt(
            F.col("p1") * (F.lit(1.0) - F.col("p1"))
            + F.col("p2") * (F.lit(1.0) - F.col("p2"))
        ),
        F.lit(2.0),
    )
    delta2 = (F.col("p2") - F.col("p1")) * (F.col("p2") - F.col("p1"))
    return k.select(
        "rel_lift",
        "p1",
        "p2",
        F.ceil(num / delta2).cast("long").alias("n_per_arm"),
    )


@q(
    "conversion_wilson_ci",
    """
    WITH conv AS (
      SELECT c.c_mktsegment AS seg,
             MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment),
    m AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS x
          FROM conv GROUP BY seg),
    k AS (SELECT seg, n, x,
                 CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                 1.959963984540054e0 AS z,  -- E-notation: DOUBLE literal
                 CAST(n AS DOUBLE) AS nd
          FROM m)
    SELECT seg, n, x, p,
      (p + z * z / (2.0 * nd)
       - z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd)))
        / (1.0 + z * z / nd) AS ci_lo,
      (p + z * z / (2.0 * nd)
       + z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd)))
        / (1.0 + z * z / nd) AS ci_hi
    FROM k
    """,
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for each segment's conversion rate —
    the uncertainty band every rate in a report should carry (Wilson
    stays inside [0,1] and behaves at small n / extreme p, unlike the
    Wald interval). Customer-level reduce, one conditional-count row
    per segment, closed-form interval from exact BIGINTs with the z
    literal in E-notation and mirrored IEEE order — bit-deterministic.
    Completes the experiment family: design (ab_test_power_plan),
    readout (ab_test_proportions), reporting (this).
    """
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    conv = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("y")
        )
        .select(F.col("c_mktsegment").alias("seg"), "y")
    )
    m = conv.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("x"),
    )
    p = F.col("x").cast("double") / F.col("n").cast("double")
    z = F.lit(1.959963984540054)
    nd = F.col("n").cast("double")
    center = p + z * z / (F.lit(2.0) * nd)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z * z / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + z * z / nd
    return m.select(
        "seg",
        "n",
        "x",
        p.alias("p"),
        ((center - half) / denom).alias("ci_lo"),
        ((center + half) / denom).alias("ci_hi"),
    )


@q(
    "lift_gains_deciles",
    """
    WITH cust AS (
      SELECT o_custkey AS id,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS s,
             MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
      FROM orders GROUP BY o_custkey),
    r AS (SELECT id, y,
                 NTILE(10) OVER (ORDER BY s DESC, id ASC) AS decile
          FROM cust),
    a AS (SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS responders
          FROM r GROUP BY decile)
    SELECT CAST(decile AS INTEGER) AS decile, n, responders,
           CAST(responders AS DOUBLE) / CAST(n AS DOUBLE) AS resp_rate,
           CAST(CAST(SUM(responders) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS DOUBLE)
             / CAST(CAST(SUM(responders) OVER () AS BIGINT) AS DOUBLE)
             AS cum_capture,
           (CAST(responders AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(CAST(SUM(responders) OVER () AS BIGINT) AS DOUBLE)
                / CAST(CAST(SUM(n) OVER () AS BIGINT) AS DOUBLE)) AS lift
    FROM a ORDER BY decile
    """,
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: decile customers by exact total spend, report
    response concentration (response = any finished order).

    Facts reduce to ONE row per customer before the global ntile sort
    (|customers|, not |orders| — the rfm_segments caveat applies; at 1B+
    entities cut by exact_quantiles instead). Cross-decile terms come
    from windows over the 10-row aggregate. Ties break by id so bucket
    assignment is deterministic; spend stays DECIMAL through the sort.
    """
    from dbt_repo_spark.operators.evalmetrics import lift_by_decile

    cust = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.sum(dec("o_totalprice", 14, 2)).alias("s"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("y"),
        )
    )
    return lift_by_decile(cust, "id", "s", "y")


@q(
    "theil_sen_trend",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
    mind AS (SELECT MIN(d) AS d0 FROM daily),
    xs AS (SELECT CAST(date_diff('day', mind.d0, d) AS DOUBLE) AS x, rev
           FROM daily, mind),
    pairs AS (SELECT (b.rev - a.rev) / (b.x - a.x) AS slope
              FROM xs a JOIN xs b ON b.x > a.x),
    rs AS (SELECT slope, row_number() OVER (ORDER BY slope) - 1 AS rk,
                  COUNT(*) OVER () AS n FROM pairs),
    med AS (SELECT AVG(slope) AS slope FROM rs
            WHERE rk IN ((n - 1) // 2, n // 2)),
    resid AS (SELECT rev - med.slope * x AS r FROM xs, med),
    rr AS (SELECT r, row_number() OVER (ORDER BY r) - 1 AS rk,
                  COUNT(*) OVER () AS n FROM resid),
    imed AS (SELECT AVG(r) AS intercept FROM rr
             WHERE rk IN ((n - 1) // 2, n // 2))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
           med.slope AS slope, imed.intercept AS intercept
    FROM med, imed
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue: the median of all
    pairwise day-to-day slopes (breakdown point 29% — one bad ingest
    day can't bend it, unlike the OLS family's groupwise_ols_slope),
    intercept = median residual at that slope.

    Scale shape: facts fold to ONE row per day first (day-level
    relation — size grows with calendar time, not data volume), the
    O(days²) pair relation comes from a broadcast self-join of that
    fold, and BOTH medians are exact order statistics through the
    two-phase ids.exact_order_statistics (range shuffle + per-partition
    counts + fetch-two-rows) — no global row_number window anywhere on
    the Spark side. Exactness: daily revenue is DECIMAL-summed; slopes
    are single IEEE divisions of identical operands; the median of an
    even count is (a+b)/2 of identical doubles — bit-equal to the
    oracle's AVG over the two picked ranks.
    """
    from dbt_repo_spark.operators.ids import exact_order_statistics

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("rev"))
    )
    mind = daily.agg(F.min("d").alias("d0"))
    xs = daily.join(F.broadcast(mind)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("double").alias("x"), "rev"
    )
    a = xs.alias("a")
    b = xs.alias("b")
    # try_divide, not '/': downstream exact_order_statistics filters
    # isNotNull(slope), Catalyst merges that conjunct into the join
    # condition, and conjunct reordering can evaluate the division on
    # pairs the b.x > a.x condition would reject — under the driver's
    # ANSI-ON session a plain '/' then throws DIVIDE_BY_ZERO (caught by
    # the bare-session sweep). Values are identical: no surviving pair
    # has a zero dx.
    pairs = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).select(
        F.try_divide(
            F.col("b.rev") - F.col("a.rev"), F.col("b.x") - F.col("a.x")
        ).alias("slope")
    )
    picked = exact_order_statistics(
        pairs, "slope", ranks_of_n=lambda n: [(n - 1) // 2, n // 2]
    )
    ks = sorted(picked)  # one key when the pair count is odd
    slope = (picked[ks[0]] + picked[ks[-1]]) / 2
    resid = xs.select((F.col("rev") - F.lit(slope) * F.col("x")).alias("r"))
    ipick = exact_order_statistics(
        resid, "r", ranks_of_n=lambda n: [(n - 1) // 2, n // 2]
    )
    iks = sorted(ipick)
    intercept = (ipick[iks[0]] + ipick[iks[-1]]) / 2
    return daily.agg(F.count("*").alias("n_days")).select(
        "n_days",
        F.expr("n_days * (n_days - 1) div 2").alias("n_pairs"),
        F.lit(slope).alias("slope"),
        F.lit(intercept).alias("intercept"),
    )


@q(
    "dp_laplace_counts",
    """
    WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw
               FROM events GROUP BY 1),
    u AS (SELECT event_type, n_raw,
                 (('0x' || substr(md5('dp:' || event_type), 1, 6))::BIGINT
                  + 0.5) / 16777216.0 AS u
          FROM g)
    SELECT event_type, n_raw,
           round(n_raw + (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                         * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS n_noisy,
           1.0 AS epsilon
    FROM u
    """,
)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, ε=1):
    per-event-type counts plus Laplace(1/ε) noise via inverse-CDF —
    noise = -sign(U-½)·(1/ε)·ln(1-2|U-½|), U uniform on (0,1). The
    governance sibling of k_anonymity_audit / masked_customer_view:
    counts leave the boundary with calibrated noise instead of raw.

    U is SEEDED from md5('dp:'||group) — deterministic fixture plumbing
    so the differential oracle can reproduce the release bit-for-bit
    (the same seeded-mechanism pattern as the contrastive-sampling
    oracle); a production release swaps in real entropy, everything
    else unchanged. n_raw rides along as the audit column (the
    production view drops it). Exactness: U is an exact dyadic
    rational, both engines evaluate the same IEEE expression tree, and
    the result is 6-dp-rounded per the float-score rule. Scale: one
    partial-aggregable count + map-side noise — group-count-sized.
    """
    g = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_raw"))
    )
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 6),
                16,
                10,
            ).cast("long")
            + F.lit(0.5)
        )
        / F.lit(16777216.0)
    ).alias("u")
    return g.select("event_type", "n_raw", u).select(
        "event_type",
        "n_raw",
        F.round(
            F.col("n_raw")
            + F.when(F.col("u") >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("u") - F.lit(0.5))),
            6,
        ).alias("n_noisy"),
        F.lit(1.0).alias("epsilon"),
    )
