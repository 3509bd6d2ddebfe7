"""Unit tests for BPE training/segmentation and dense ID assignment.

(The registry-level oracle/rows-only checks for recursive_order_chain,
vocab_dense_ids, and bpe_tokenize live in test_oracle_parity.py via
parametrization; these pin the operator semantics directly.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_repo_spark.operators import bpe
from dbt_repo_spark.operators.ids import dense_ids


def _toy_corpus(spark):
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_learns_classic_merges(spark):
    """The textbook corpus: 'es' must be the first merge (count 9 beats
    every competitor), then 'es'+'t' (9), then 'est</w>' (9)."""
    wc = bpe.word_counts(_toy_corpus(spark), "text")
    merges = bpe.train_bpe(wc, num_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")


def test_bpe_segment_applies_merges_greedily(spark):
    df = _toy_corpus(spark)
    merges = bpe.train_bpe(bpe.word_counts(df, "text"), num_merges=3)
    seg = bpe.segment(
        spark.createDataFrame([(7, "newest bestest")], "doc_id long, text string"),
        merges,
        "doc_id",
        "text",
    ).collect()[0]
    pieces = seg["pieces"]
    # both words end in the learned est</w> piece; unseen prefixes stay chars
    assert pieces[-1] == "est</w>"
    assert "est</w>" in pieces[: len(pieces) - 1]
    assert seg["n_pieces"] == len(pieces)


def test_bpe_deterministic_across_runs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = bpe.word_counts(docs, "text")
    m1 = bpe.train_bpe(wc, num_merges=50)
    m2 = bpe.train_bpe(bpe.word_counts(docs, "text"), num_merges=50)
    assert m1 == m2 and len(m1) == 50


def test_bpe_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # every pair occurs once -> below min_pair_count=2 -> no merges
    assert bpe.train_bpe(bpe.word_counts(df, "text"), num_merges=10) == []


def test_dense_ids_are_rank_by_value(spark):
    df = spark.createDataFrame(
        [("pear",), ("apple",), ("fig",), ("pear",), (None,)], "v string"
    )
    got = {r["v"]: r["id"] for r in dense_ids(df, "v").collect()}
    assert got == {"apple": 0, "fig": 1, "pear": 2}


def test_dense_ids_dense_and_deterministic_at_scale(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    out = dense_ids(terms, "term", id_col="tid").collect()
    ids = sorted(r["tid"] for r in out)
    assert ids == list(range(len(out)))  # dense, 0-based, no gaps
    by_term = sorted(out, key=lambda r: r["term"])
    assert [r["tid"] for r in by_term] == list(range(len(out)))  # rank order


def test_exact_quantiles_match_percentile_aggregate(spark):
    """Distributed exact quantiles == Spark's buffered percentile agg,
    bit for bit, including edge probabilities and interpolation."""
    from pyspark.sql import functions as F

    from dbt_repo_spark.operators.ids import exact_quantiles

    df = (
        spark.range(10_007)
        .select(((F.col("id") * 2654435761) % 1_000_003).alias("x"))
        .withColumn("x", F.col("x").cast("double") / 7.0)
        .repartition(13)
    )
    probs = [0.0, 0.001, 0.25, 0.5, 0.75, 0.99, 1.0]
    mine = exact_quantiles(df, "x", probs)
    ref = df.agg(
        *[F.percentile("x", F.lit(p)).alias(f"p{i}") for i, p in enumerate(probs)]
    ).collect()[0]
    assert all(mine[i] == ref[f"p{i}"] for i in range(len(probs)))

    empty = spark.range(1).filter("id < 0").select(F.col("id").cast("double").alias("x"))
    assert exact_quantiles(empty, "x", [0.5]) == [None]
