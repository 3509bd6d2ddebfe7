"""Retrieval-family semantics: BM25 against a hand-computed fixture,
RRF fusion rules, char-entropy edge cases, exact-substring span merging.

The registry queries carry full DuckDB oracles (test_oracle_parity
covers cross-engine equality); these tests pin the *semantics* on
fixtures small enough to verify by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_repo_spark.operators import dedup, retrieval, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed(spark):
    """One query doc {'a b'}, corpus of three docs — scores match the
    Okapi formula computed by hand (k1=1.2, b=0.75, BM25+ idf)."""
    df = _docs(
        spark,
        [
            (0, "a b"),          # query
            (1, "a a c"),        # tf(a)=2, dl=3
            (2, "b c d e"),      # tf(b)=1, dl=4
            (3, "c d"),          # no query terms -> absent
        ],
    )
    out = {
        r.doc_id: r.score
        for r in retrieval.bm25_topk(df, F.col("doc_id") == 0, k=5).collect()
    }
    assert set(out) == {1, 2}

    def contrib(tf, dl, dfreq, n=3, avgdl=3.0):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return round(c, 9)

    assert out[1] == contrib(tf=2, dl=3, dfreq=1)
    assert out[2] == contrib(tf=1, dl=4, dfreq=1)
    # doc 1 has the saturated-tf advantage on the same idf -> ranks first
    assert out[1] > out[2]


def test_bm25_rank_determinism_and_k(spark):
    """Ranks are dense 1..k per query, ties broken by doc_id."""
    df = _docs(
        spark,
        [(0, "x")] + [(i, "x") for i in range(1, 9)],  # 8 identical docs
    )
    rows = retrieval.bm25_topk(df, F.col("doc_id") == 0, k=3).collect()
    assert [(r.rank, r.doc_id) for r in sorted(rows, key=lambda r: r.rank)] == [
        (1, 1), (2, 2), (3, 3)  # equal scores -> doc_id ascending
    ]


def test_rrf_missing_leg_contributes_zero(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank long"
    )
    rows = {r.doc_id: r for r in retrieval.rrf_fuse(a, b, k=10).collect()}
    assert rows[11].rrf_score == 1 / 61 + 1 / 62  # both legs
    assert rows[10].rrf_score == 1 / 61            # leg-a only
    assert rows[12].rrf_score == 1 / 62            # leg-b only
    assert rows[10].rank_b is None and rows[12].rank_a is None
    # doc in both legs outranks the single-leg docs
    assert rows[11].fused_rank == 1


def test_char_entropy_uniform_and_degenerate(spark):
    df = _docs(spark, [(1, "aaaa"), (2, "abcd"), (3, ""), (4, "ab")])
    out = {r.doc_id: r for r in text.char_entropy(df, "doc_id", "text").collect()}
    assert out[1].entropy == 0.0 and out[1].is_low_entropy
    assert out[2].entropy == round(math.log(4), 9)  # uniform -> ln(k)
    assert out[2].n_distinct_chars == 4
    assert out[3].entropy is None and out[3].n_chars == 0
    assert out[4].entropy == round(math.log(2), 9)


def test_substring_spans_merge_and_offsets(spark):
    """Two docs sharing a 6-token run -> positions 1 and 2 both carry
    duplicated 5-grams and merge into one maximal span 1..6; the unique
    tail never appears."""
    shared = "q w e r t y"
    df = _docs(
        spark,
        [
            (1, f"{shared} unique1 tail1 one two"),
            (2, f"{shared} unique2 tail2 three four"),
            (3, "no duplicated grams here at all ok"),
        ],
    )
    rows = dedup.exact_substring_spans(df, "doc_id", "text", n=5).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
           for r in rows}
    assert got == {(1, 1, 6, 6, 2), (2, 1, 6, 6, 2)}


def test_substring_spans_within_doc_repeat(spark):
    """A 5-gram repeated INSIDE one doc is duplicated too (corpus-wide
    count >= 2 includes same-doc occurrences), and non-adjacent islands
    stay separate spans (gap > n)."""
    run = "a b c d e"
    df = _docs(spark, [(1, f"{run} x1 x2 x3 x4 x5 x6 {run}")])
    rows = sorted(
        dedup.exact_substring_spans(df, "doc_id", "text", n=5).collect(),
        key=lambda r: r.span_start,
    )
    assert [(r.span_start, r.span_end) for r in rows] == [(1, 5), (12, 16)]
