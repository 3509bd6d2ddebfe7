"""Group-wise model fitting via Arrow-batched ``applyInPandas``.

The sanctioned shape for per-group Python math in this engine: ONE
shuffle on the group key, then closed-form fitting inside each Arrow
batch — no driver collect, no per-row Python. Used where the estimator
is genuinely easier in NumPy than in expressions; the arithmetic here is
deliberately INTEGER-exact (inputs pre-cast to int64 day-indexes and
cent-values in Spark) so the single final double division is bit-identical
to a SQL oracle computing the same sums — the engine's cross-engine
exactness rule (dbt_repo_spark/queries.py module doc) extended through
the Python boundary.

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
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy()
        x = x - x.min()
        y = pdf["y"].to_numpy()
        n = len(pdf)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        sxy = int((x * y).sum())
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            return pd.DataFrame(
                {"k": pd.Series(dtype="int64"),
                 "n_obs": pd.Series(dtype="int64"),
                 "slope": pd.Series(dtype="float64")}
            )
        num = n * sxy - sx * sy
        return pd.DataFrame(
            {"k": [int(pdf["k"].iloc[0])], "n_obs": [n],
             "slope": [float(num) / float(den)]}
        )

    out = src.groupBy("k").applyInPandas(fit, schema="k long, n_obs long, slope double")
    return out.select(
        F.col("k").alias(key_col),
        "n_obs",
        "slope",
    )
