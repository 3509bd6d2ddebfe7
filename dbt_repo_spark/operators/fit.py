"""Group-wise model fitting via Arrow-batched ``applyInPandas``.

The sanctioned shape for per-group Python math in this engine: ONE
shuffle, then closed-form fitting inside each Arrow batch — no driver
collect, no per-row Python. Two design rules learned by measurement:

1. **Never one Python call per group.** ``groupBy(key).applyInPandas``
   invokes the function once per key — at 15k customer groups that is
   15k interpreter round-trips and measured 21s at sf0.1. Instead the
   keys are hashed into ``n_buckets`` coarse groups and the fit runs a
   vectorized pandas groupby INSIDE each call: same semantics, ~60 calls,
   0.5s. (The same rule the similarity ops follow: amortize the Python
   boundary over thousands of rows.)
2. **Integer-exact arithmetic through the boundary.** Inputs are
   pre-cast to int64 day-indexes and cent-values in Spark; all sums stay
   int64 (exact for |Σ| < 2⁶³ — centered x bounds the products), and the
   single final double division is bit-identical to a SQL oracle
   computing the same sums — the engine's cross-engine exactness rule
   (dbt_repo_spark/queries.py module doc) extended through Python.

No reference equivalent (the reference has no UDFs at all, SURVEY.md
§2.10); this is the training-pipeline escape hatch done right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groupwise_ols(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-key OLS slope of integer y over integer x (closed form).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), computed on x centered at
    the per-group minimum (slope-invariant; keeps products in int64
    range). Groups with n < 2 or zero x-variance are dropped. Output:
    (key, n_obs, slope) with slope the one double division.
    """
    import pandas as pd

    src = df.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn("__b", F.pmod(F.col("k"), F.lit(n_buckets)))

    def fit_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("k", sort=False)
        xc = (pdf["x"] - g["x"].transform("min")).astype("int64")
        tmp = pd.DataFrame(
            {
                "k": pdf["k"],
                "xc": xc,
                "y": pdf["y"],
                "xx": xc * xc,
                "xy": xc * pdf["y"],
            }
        )
        s = (
            tmp.groupby("k", sort=False)
            .agg(
                n=("xc", "size"),
                sx=("xc", "sum"),
                sy=("y", "sum"),
                sxx=("xx", "sum"),
                sxy=("xy", "sum"),
            )
            .reset_index()
        )
        den = s["n"] * s["sxx"] - s["sx"] * s["sx"]
        num = s["n"] * s["sxy"] - s["sx"] * s["sy"]
        keep = (s["n"] >= 2) & (den != 0)
        return pd.DataFrame(
            {
                "k": s.loc[keep, "k"],
                "n_obs": s.loc[keep, "n"].astype("int64"),
                "slope": num[keep].astype("float64") / den[keep].astype("float64"),
            }
        )

    out = src.groupBy("__b").applyInPandas(
        fit_bucket, schema="k long, n_obs long, slope double"
    )
    return out.select(F.col("k").alias(key_col), "n_obs", "slope")


def gram_partials(df: DataFrame, arr_col: str, dim: int) -> DataFrame:
    """Exact-integer Gram matrix XᵀX plus column sums of an
    ``array<bigint>`` column, as per-partition partials — the dense
    linear-algebra reduce done through the Arrow seam instead of a
    posexplode self-join (which ships dim² rows PER VECTOR through a
    shuffle before the hash-agg can fold them; measured at dim=64 that
    is a 4096×-exploded relation for a 64×64 result).

    Each partition folds its vectors into ONE dim×dim int64 matrix with
    a NumPy integer matmul (exact, no float path) and emits dim²+dim
    rows: ``(i, j, p)`` Gram partials for j ≥ 0 and column-sum partials
    tagged ``j = -1``. The caller finishes with a tiny groupBy over
    |partitions|·(dim²+dim) rows, summing in decimal(38,0) — integer
    partials are order-independent, so the result is bit-identical to
    the exploded-join formulation and to a SQL oracle (full-oracle-safe).

    Overflow: a partition's partial is ≤ rows_per_partition · max|v|²;
    with 3-dp-quantized unit-scale embeddings (|v| ≤ ~2·10³) that is
    < 2⁶³ up to ~10⁹ rows per partition — partition sizing, not data
    volume, bounds it. NULL arrays contribute no rows (the posexplode
    semantics this replaced); a wrong-length array raises a named
    ValueError (ragged vectors are corruption, not skippable). Returns
    (i INT, j INT, p BIGINT) partials.
    """
    import numpy as np
    import pandas as pd

    def fold(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["_varr"].dropna()  # NULL array == no rows, the
            if not len(arrs):             # posexplode semantics this
                continue                  # seam replaced
            arrs = arrs.to_numpy()
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64)
            if (lens != dim).any():
                bad = int((lens != dim).sum())
                raise ValueError(
                    f"gram_partials: {bad} array(s) with length != {dim} "
                    f"(got lengths {sorted(set(lens.tolist()))[:5]}) — "
                    "ragged vectors are data corruption, not skippable"
                )
            v = np.stack(arrs).astype(np.int64, copy=False)
            g += v.T @ v
            s += v.sum(axis=0)
            seen = True
        if not seen:
            return
        ii, jj = np.indices((dim, dim))
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(dim)]).astype(
                    "int32"
                ),
                "j": np.concatenate([jj.ravel(), np.full(dim, -1)]).astype(
                    "int32"
                ),
                "p": np.concatenate([g.ravel(), s]),
            }
        )

    return df.select(F.col(arr_col).alias("_varr")).mapInPandas(
        fold, schema="i int, j int, p long"
    )
