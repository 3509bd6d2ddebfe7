"""Lexical retrieval operators: BM25 scoring and reciprocal-rank fusion.

The LLM-pipeline families already cover the *representation* side of
retrieval (TF-IDF term weighting in ``text.py``, exact/ANN cosine over
embeddings in ``similarity.py``). This module adds the *query* side: score
a small query workload against a large corpus with Okapi BM25 (the
standard lexical ranker — Robertson & Zaragoza 2009, public literature),
and fuse a lexical ranking with a dense ranking via reciprocal-rank
fusion (Cormack, Clarke & Buettcher 2009) — the canonical hybrid-search
recipe used by every modern RAG stack.

Scale shape (100 TB corpus, small query set — the production asymmetry):

- The query→corpus scoring join broadcasts the DISTINCT (query, term)
  relation (small by contract: |queries| × |query vocab|) against the
  per-(doc, term) corpus term frequencies, so the corpus shuffles only
  for its own tf / doc-length / doc-frequency aggregations — all
  linear, map-side-combinable hash aggs. No corpus×corpus product
  anywhere; candidate volume is bounded by postings of the query terms,
  exactly like an inverted index probe.
- Per-(query, doc) accumulation rides one keyed hash agg whose key space
  is |queries| × |matched docs| — the same asymptotics as a posting-list
  merge.

Cross-engine exactness (the rules from ``queries.py``'s module doc):
every per-term BM25 contribution is a product/quotient of doubles whose
operands are bit-identical across engines (integer counts, exact
half-integer literals, one division); the only transcendental is ``ln``,
so each contribution is rounded to 9 dp and summed as DECIMAL(20,9) —
an order-independent exact sum, cast back to double at the end. RRF
scores are sums of two exact reciprocals of integers — bit-identical
with no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_repo_spark.operators.dedup import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k: rank corpus docs for every query doc.

    Rows matching ``query_pred`` form the query workload (their DISTINCT
    tokens are the query terms); the remaining rows are the corpus.
    idf uses the non-negative BM25+ form ``ln(1 + (N - df + 0.5) /
    (df + 0.5))``; the tf saturation uses k1=1.2, b=0.75.

    Output: (query_id, doc_id, score, rank) with rank <= k, ties broken
    by doc_id. ``score`` is the DECIMAL(20,9)-exact sum of per-term
    contributions (each rounded to 9 dp) cast to double — identical bits
    in Spark and DuckDB, so ranking is deterministic cross-engine.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        query_pred.alias("is_q"),
        tokens(F.col(text_col)).alias("w"),
    )
    tok = base.select("doc_id", "is_q", F.explode("w").alias("term"))
    qterms = (
        tok.filter(F.col("is_q"))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    ctf = (
        tok.filter(~F.col("is_q"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # Doc lengths come straight off the scan (size of the token array —
    # no aggregation shuffle); docs with zero tokens are excluded so the
    # relation matches what a ctf-derived per-doc sum would contain.
    dl = (
        base.filter(~F.col("is_q") & (F.size("w") >= 1))
        .select("doc_id", F.size("w").cast("long").alias("dl"))
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    # Prune corpus postings to the query vocabulary BEFORE any term
    # statistics: df(term) only matters for query terms, and the pruned
    # relation (an inverted-index probe's posting lists) is what every
    # later join touches. Both the vocabulary and its doc frequencies
    # are small by contract -> broadcast; the only corpus-keyed shuffle
    # after ctf is the doc-length attach. The pruned postings feed two
    # consumers (doc frequencies, scoring) -> persist the slim relation
    # instead of re-running the tokenize+count subtree per consumer.
    # Persist lifetime (ADVICE r05): the pin lives until the session
    # drops it — a lazy plan can't unpersist inline without losing the
    # sharing. Long-lived sessions reclaim it via LRU eviction; the
    # bench harness unpersists explicitly in its per-query teardown.
    qvocab = qterms.select("term").distinct()
    post = ctf.join(F.broadcast(qvocab), "term").persist()
    dfreq = post.groupBy("term").agg(F.count("*").alias("dfreq"))
    # The BM25 contribution of a (doc, term) posting is query-INDEPENDENT
    # (idf x tf-saturation), so compute + round it once per posting
    # (O(postings) rows) and only THEN fan out to the query workload —
    # the per-(query, doc, term) join would otherwise evaluate the whole
    # expression tree on O(postings x queries-per-term) rows. Identical
    # numbers: the oracle rounds the same per-row value after its join.
    per_term = (
        post.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl))
        )
    )
    weighted = per_term.select(
        "doc_id",
        "term",
        F.round(contrib, 9).cast("decimal(20,9)").alias("contrib"),
    )
    agg = (
        weighted.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("s").cast("double").alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two (query_id, doc_id, rank) relations.

    RRF(d) = sum over lists of 1 / (k0 + rank_list(d)) — a doc missing
    from a list contributes 0 for it. Both reciprocals are exact double
    divisions of identical integer operands, summed in a fixed textual
    order, so the fused score is bit-identical cross-engine with no
    rounding step at all.

    Output: (query_id, doc_id, rank_a, rank_b, rrf_score, fused_rank)
    with fused_rank <= k, ties broken by doc_id. The per-leg ranks stay
    nullable — which leg surfaced a doc is the debugging signal hybrid
    search needs.
    """
    a = rank_a.select("query_id", "doc_id", F.col("rank").alias("rank_a"))
    b = rank_b.select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score",
        F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_b")), F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank_a",
            "rank_b",
            "rrf_score",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )
