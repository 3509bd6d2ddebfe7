"""Hybrid-retrieval & substring-dedup query family (round-5 additions).

Completes the retrieval story the corpus already tells half of: TF-IDF
weighs terms per doc (``text_tfidf_topk``), dense ANN ranks by embedding
(``embed_*_topk``) — this family adds the lexical *query* ranker (Okapi
BM25), the lexical+dense hybrid fusion every RAG stack runs (reciprocal-
rank fusion), the character-entropy gibberish gate, and exact-duplicated
substring SPANS (the offsets Lee et al. 2022's suffix-array dedup cuts,
where ``text_dup_passages`` only reports per-doc fractions).

All four carry full DuckDB oracles. Cross-engine float determinism
follows the queries.py module-doc recipes: transcendental per-term
contributions round to 9 dp and accumulate as DECIMAL(20,9) (order-
independent exact sums); RRF scores are sums of exact reciprocals of
integers in fixed textual order (bit-identical, no rounding); span
arithmetic is all-integer. SQL float literals are CAST(... AS DOUBLE)
so DuckDB's decimal-literal default can't change the arithmetic type.

Registered into the shared QUERIES/ORACLES maps (imported from
``dbt_repo_spark.queries`` at the bottom of that module, after the
other extension families so new names sort last in registry order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_repo_spark.operators import dedup, retrieval, similarity, text
from dbt_repo_spark.queries import q, t

# Query workload: every 50th doc (offset 7 keeps the sf0.001 query doc
# non-trivial) — 1 query doc at sf0.001, 10 at sf0.01, ~100 at sf0.1.
_QUERY_MOD, _QUERY_OFF = 50, 7

_BM25_CTES = """
    tok AS (SELECT doc_id, (doc_id % 50 = 7) AS is_q,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS term
            FROM documents),
    qterms AS (SELECT DISTINCT doc_id AS query_id, term FROM tok WHERE is_q),
    ctf AS (SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE NOT is_q GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM ctf GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
    dfreq AS (SELECT term, COUNT(*) AS dfreq FROM ctf GROUP BY 1),
    scored AS (
      SELECT qt.query_id, c.doc_id,
             ln(1 + (s.n_docs - d.dfreq + CAST(0.5 AS DOUBLE))
                    / (d.dfreq + CAST(0.5 AS DOUBLE)))
             * (c.tf * CAST(2.2 AS DOUBLE))
             / (c.tf + CAST(1.2 AS DOUBLE)
                * (CAST(0.25 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * (l.dl / (s.total_dl / s.n_docs))))
               AS contrib
      FROM ctf c JOIN qterms qt USING (term) JOIN dfreq d USING (term)
           JOIN dl l ON c.doc_id = l.doc_id CROSS JOIN stats s),
    bm_agg AS (SELECT query_id, doc_id,
                      SUM(CAST(round(contrib, 9) AS DECIMAL(20,9))) AS sd
               FROM scored GROUP BY 1, 2),
    bm_rank AS (SELECT query_id, doc_id, sd,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sd DESC, doc_id) AS bm_rn
                FROM bm_agg)
"""


@q(
    "text_bm25_topk",
    f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, CAST(sd AS DOUBLE) AS score,
           CAST(bm_rn AS BIGINT) AS rank
    FROM bm_rank WHERE bm_rn <= 5
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (retrieval.py::bm25_topk): every 50th
    doc plays a query against the rest of the corpus; top-5 by the
    DECIMAL-exact BM25 sum. Query terms broadcast against corpus
    (doc, term) frequencies — inverted-index-probe asymptotics, no
    corpus product.
    """
    docs = t(spark, sf_dir, "documents")
    return retrieval.bm25_topk(
        docs, F.col("doc_id") % _QUERY_MOD == _QUERY_OFF, k=5
    )


@q(
    "retrieval_rank_fusion",
    f"""
    WITH {_BM25_CTES},
    bm20 AS (SELECT query_id, doc_id, bm_rn FROM bm_rank WHERE bm_rn <= 20),
    e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
    nr AS (SELECT vec_id, sqrt(list_dot_product(v0, v0)) AS nrm, v0 FROM e0),
    e AS (SELECT vec_id, list_transform(v0, x -> x / nrm) AS v FROM nr),
    cq AS (SELECT vec_id, v FROM e WHERE vec_id % 50 = 7),
    cc AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 7),
    cs AS (SELECT cq.vec_id AS query_id, cc.vec_id AS doc_id,
                  list_dot_product(cq.v, cc.v) AS raw
           FROM cq CROSS JOIN cc),
    cr AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY raw DESC, doc_id) AS cos_rn
           FROM cs),
    cr20 AS (SELECT query_id, doc_id, cos_rn FROM cr WHERE cos_rn <= 20),
    fused AS (
      SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.doc_id) AS doc_id,
             CAST(b.bm_rn AS BIGINT) AS rank_bm25,
             CAST(c.cos_rn AS BIGINT) AS rank_cos,
             COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.bm_rn),
                      CAST(0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + c.cos_rn),
                        CAST(0 AS DOUBLE)) AS rrf_score
      FROM bm20 b FULL OUTER JOIN cr20 c
        ON b.query_id = c.query_id AND b.doc_id = c.doc_id)
    SELECT query_id, doc_id, rank_bm25, rank_cos, rrf_score,
           CAST(fr AS BIGINT) AS fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, doc_id) AS fr
          FROM fused)
    WHERE fr <= 10
    """,
)
def retrieval_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 (documents) + exact cosine (embeddings, ids
    aligned doc_id=vec_id) fused by reciprocal-rank fusion
    (retrieval.py::rrf_fuse, k0=60 — the Cormack et al. constant).
    RRF needs only the two rank columns, so the fusion is a (query, doc)
    keyed outer join of two 20-row-per-query relations — tiny no matter
    the corpus size; each leg keeps its own scale shape (broadcast
    probe / brute-force scoring here, swappable for the ANN path).
    """
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    pred = F.col("doc_id") % _QUERY_MOD == _QUERY_OFF
    bm = retrieval.bm25_topk(docs, pred, k=20)
    corpus = similarity._normalized(
        emb.filter(F.col("vec_id") % _QUERY_MOD != _QUERY_OFF),
        "doc_id", "cv", "vec_id", "embedding",
    )
    qs = similarity._normalized(
        emb.filter(F.col("vec_id") % _QUERY_MOD == _QUERY_OFF),
        "query_id", "qv", "vec_id", "embedding",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw").desc(), F.col("doc_id").asc()
    )
    cos = (
        corpus.crossJoin(F.broadcast(qs))
        .withColumn("raw", similarity.dot(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    return (
        retrieval.rrf_fuse(bm, cos, k=10, k0=60)
        .withColumnRenamed("rank_a", "rank_bm25")
        .withColumnRenamed("rank_b", "rank_cos")
    )


@q(
    "text_char_entropy",
    """
    WITH base AS (SELECT doc_id, text AS tx FROM documents),
    chars AS (SELECT doc_id, substr(tx, i, 1) AS ch
              FROM base, UNNEST(range(1, length(tx) + 1)) AS u(i)
              WHERE length(tx) >= 1),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
    per_doc AS (SELECT doc_id, SUM(c) AS n_chars,
                       COUNT(*) AS n_distinct_chars,
                       CAST(SUM(CAST(round(c * ln(c), 9) AS DECIMAL(20,9)))
                            AS DOUBLE) AS s
                FROM cnt GROUP BY 1)
    SELECT b.doc_id,
           CAST(COALESCE(p.n_chars, 0) AS BIGINT) AS n_chars,
           CAST(COALESCE(p.n_distinct_chars, 0) AS BIGINT)
             AS n_distinct_chars,
           round(ln(p.n_chars) - p.s / p.n_chars, 9) AS entropy,
           round(ln(p.n_chars) - p.s / p.n_chars, 9) < CAST(2.5 AS DOUBLE)
             AS is_low_entropy
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per doc (text.py::char_entropy) — the
    below-token gibberish/spam gate (mono-char runs and template spam
    score low where token-level quality rules can't see them). H =
    ln(n) - (1/n)*sum(c*ln c) with the float sum DECIMAL-exact.
    """
    docs = t(spark, sf_dir, "documents")
    return text.char_entropy(docs, "doc_id", "text", low_threshold=2.5)


@q(
    "dedup_substring_spans",
    """
    WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                             x -> x <> '') AS w
                  FROM documents),
    pos AS (SELECT doc_id, s.pos AS pos, s.g AS g
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(w) - 3),
                           i -> struct_pack(pos := i,
                                  g := array_to_string(
                                         list_slice(w, i, i + 4), ' ')))) AS s
                  FROM toks WHERE len(w) >= 5)),
    occ AS (SELECT g, COUNT(*) AS occ FROM pos GROUP BY 1),
    dup AS (SELECT doc_id, pos FROM pos JOIN occ USING (g) WHERE occ >= 2),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                          OR pos - lag(pos) OVER w > 5
                        THEN 1 ELSE 0 END AS new_island
            FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    grpd AS (SELECT doc_id, pos,
                    SUM(new_island) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS grp
             FROM isl)
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
           COUNT(*) AS n_dup_grams
    FROM grpd GROUP BY doc_id, grp
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal exact-duplicated 5-gram spans with token offsets
    (dedup.py::exact_substring_spans) — the Lee-et-al exact-substring
    dedup cut list. Spark counts gram occurrences on xxhash64 keys
    (8-byte shuffle); the oracle counts the gram strings — identical
    counts, and every downstream number is integer-exact.
    """
    docs = t(spark, sf_dir, "documents")
    return dedup.exact_substring_spans(docs, "doc_id", "text", n=5)
