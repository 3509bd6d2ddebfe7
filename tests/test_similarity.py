"""Similarity-operator cross-checks: the three ANN variants against the
exact expression-based brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_repo_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_vectorized_topk_matches_expression_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(similarity.cosine_topk(emb, F.col("vec_id") < 10, k=5))
    vec = _pairs(similarity.cosine_topk_vectorized(emb, F.col("vec_id") < 10, k=5))
    assert vec == exact  # both exact brute force → identical neighbor sets


def test_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(similarity.cosine_topk(emb, F.col("vec_id") < 10, k=5))
    ivf = _pairs(similarity.ivf_topk(emb, F.col("vec_id") < 10, k=5))
    assert len(exact & ivf) / len(exact) >= 0.85


def test_cosine_pairs_symmetric_and_thresholded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = similarity.cosine_pairs(emb, threshold=0.4)
    rows = pairs.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.score >= 0.4 for r in rows)


def test_embedding_near_duplicates_subset_of_exact(spark):
    """LSH near-dups are a (recall-limited) subset of the exact pair set."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b) for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_duplicates(emb, threshold=0.4, n_planes=4).collect()
    }
    assert lsh <= exact
