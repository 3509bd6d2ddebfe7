"""Z-order layout (operators/layout.py): interleaving math + measured
multi-column file-extent tightness vs a single-key sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_repo_spark.operators.layout import zorder_key, zorder_layout


def test_zorder_interleaves_bits(spark):
    # 2 cols x 2 bits; uniform 0..3 values with exact quantile boundaries
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.withColumn("z", zorder_key(df, ["x", "y"], bits=2, relative_error=0.0))
    got = {(r["x"], r["y"]): r["z"] for r in out.collect()}
    # rank == value here; z = interleave(xbits, ybits), x contributes even bits
    def morton(x, y):
        z = 0
        for k in range(2):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        return z
    assert got == {(x, y): morton(x, y) for x, y in rows}


def _mean_extents(path: str, cols: list[str], spans: dict[str, tuple]) -> dict[str, float]:
    exts: dict[str, list[float]] = {c: [] for c in cols}
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for c in cols:
            idx = md.schema.names.index(c)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            lo, hi = spans[c]
            exts[c].append((max(maxs) - min(mins)) / (hi - lo))
    return {c: sum(v) / len(v) for c, v in exts.items()}


@pytest.mark.slow
def test_zorder_tightens_both_columns(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    spans = {
        c: (r["mn"], r["mx"])
        for c, r in (
            (c, li.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).first())
            for c in ("l_orderkey", "l_partkey")
        )
    }
    single = str(tmp_path / "single")
    li.repartitionByRange(16, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(single)
    zpath = str(tmp_path / "zorder")
    zorder_layout(li, ["l_orderkey", "l_partkey"], num_files=16).write.parquet(zpath)

    cols = ["l_orderkey", "l_partkey"]
    e_single = _mean_extents(single, cols, spans)
    e_z = _mean_extents(zpath, cols, spans)
    # single-key sort: clustered col tight, the other spans ~everything
    assert e_single["l_orderkey"] < 0.15
    assert e_single["l_partkey"] > 0.8
    # z-order: BOTH columns' extents shrink well below the full span
    assert e_z["l_orderkey"] < 0.5
    assert e_z["l_partkey"] < 0.5
    # and the worst column improves by >= 2x vs single-key layout
    assert max(e_z.values()) * 2 < e_single["l_partkey"]
