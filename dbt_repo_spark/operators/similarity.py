"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``    — exact brute-force top-k: broadcast the query set
  against the corpus; dot products are JVM-side ``zip_with``/``aggregate``
  expressions in double precision (no Python, no UDF).
- ``lsh_bucket_topk``— the scale path: random-hyperplane LSH buckets the
  corpus once (hash-derived deterministic planes), probes only matching
  buckets, exact-reranks inside. Sub-linear candidate set vs corpus size.

At 100 TB the corpus side stays partitioned; only the (small) query set is
broadcast, so brute force is one scan + map-side top-k via the window
partial aggregation. The LSH variant additionally prunes the scan by
bucket key, which a partitioned layout turns into partition pruning.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_repo_spark.session import fan_out

_FIXTURES_DIR = Path(__file__).resolve().parent.parent / "fixtures"


def _dvec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (deterministic accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def _normalized(df: DataFrame, id_out: str, vec_out: str, id_col: str, vec_col: str) -> DataFrame:
    """Project (id, unit-normalized double vector).

    Normalizing ONCE per row turns every downstream pairwise cosine into a
    single dot product — brute-force scoring does 1/3 the aggregate work
    and, more importantly, stops recomputing each row's own norm per PAIR.
    The norm goes through a materialized column so it's evaluated once,
    not per vector element.
    """
    v = _dvec(F.col(vec_col))
    return (
        fan_out(df)  # per-element normalize + scoring is CPU-bound
        .select(F.col(id_col).alias(id_out), v.alias(vec_out))
        .withColumn("__n", F.sqrt(dot(F.col(vec_out), F.col(vec_out))))
        .withColumn(vec_out, F.transform(F.col(vec_out), lambda x: x / F.col("__n")))
        .drop("__n")
    )


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every row matching ``query_pred``.

    Output: (query_id, neighbor_id, score) with score rounded to 6 dp for
    cross-engine comparability; ranking happens on the raw double.
    """
    corpus = _normalized(emb, "neighbor_id", "cv", id_col, vec_col)
    queries = _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("raw_score", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("raw_score", 6).alias("score"))
    )


# DataFrames persisted by with_recall_vs_exact, pending caller release —
# see the persist-lifetime note inside the function.
_RECALL_AUDIT_PINS: list[DataFrame] = []


def release_recall_audit_pins() -> int:
    """Unpersist every relation pinned by ``with_recall_vs_exact`` calls
    so far; returns how many were released. Call after the audited
    results are materialized (collect/write) in any long-lived session —
    otherwise each audit pins another cached relation until LRU eviction
    starts knocking out OTHER queries' warm state."""
    n = 0
    while _RECALL_AUDIT_PINS:
        df = _RECALL_AUDIT_PINS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def with_recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Attach per-query recall@k vs an exact result to an approximate one.

    Self-validating output for approximate ANN registry queries: every
    row carries ``recall_at_k`` = |approx ∩ exact| / k for its query, so
    a rows-only harness check still observes retrieval quality (a recall
    collapse changes the values, not just the count). Both inputs are
    (query_id, neighbor_id, ...) relations; the exact side is k rows per
    query by construction.

    Recall is anchored on the EXACT side's query set: a query whose
    approximate bucket came back empty still contributes one marker row
    (null neighbor, recall 0) instead of silently vanishing, so a
    per-query recall collapse is visible in values, not only in counts.
    """
    # The approx relation is consumed TWICE (hit-marking join below +
    # the final right join) — without the persist both consumers re-run
    # the entire approximate-search subtree (bucket join / probe /
    # rerank), doubling the operator's cost. The relation is k rows per
    # query by construction, so pinning it is O(queries × k) — trivial.
    # Persist LIFETIME: the result is lazy, so this operator cannot
    # unpersist safely itself; the pin is recorded in
    # _RECALL_AUDIT_PINS and a long-lived session should call
    # release_recall_audit_pins() once results are materialized (the
    # bench harness's RDD-level teardown covers the bench; this hook
    # covers everyone else — r06 traced eviction-induced cold-mode
    # drift to exactly this kind of orphaned pin).
    from pyspark import StorageLevel

    approx = approx.persist(StorageLevel.MEMORY_AND_DISK)
    _RECALL_AUDIT_PINS.append(approx)
    # One reference to the exact subtree: left-join its (query, neighbor)
    # pairs against the approx pairs and fold hit counts per query. The
    # exact side has every query (k rows each), so this also yields
    # recall 0 for queries whose approximate bucket came back empty.
    per_query = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.round(F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.lit(k), 4).alias(
                "recall_at_k"
            )
        )
    )
    # RIGHT join on the exact query set: a query with no approximate rows
    # surfaces as a null-neighbor marker row instead of disappearing.
    return approx.join(per_query, "query_id", "right")


def cosine_topk_vectorized(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k via Arrow-batched NumPy matmul (BLAS path).

    The expression-based ``cosine_topk`` evaluates a zip_with/aggregate
    lambda per pair — fine for modest corpora, but dense linear algebra is
    the one workload where the Python boundary WINS: the query matrix
    (k queries × dim) is collected once (tiny), broadcast into a
    ``mapInPandas`` stage, and each Arrow batch of corpus vectors scores
    against ALL queries in one ``corpus_block @ Q.T`` BLAS call. Per-batch
    partial top-k keeps the shuffle at O(batches × queries × k) rows; a
    final window takes the global top-k. Same exact results as the
    expression path (both are exact brute force).
    """
    import numpy as np
    import pandas as pd

    queries = _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
    qrows = queries.collect()  # small by contract (the query set)
    qids = np.array([r.query_id for r in qrows])
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)  # (nq, dim)

    out_schema = "query_id long, neighbor_id long, raw_score double"

    def score_batches(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = np.array(list(pdf["v"]), dtype=np.float64)  # (n, dim)
            scores = mat @ qmat.T  # (n, nq) one BLAS call
            out = []
            for j, qid in enumerate(qids):
                # Rank on the round-to-6dp score (ties → neighbor_id asc):
                # BLAS pairwise summation differs from the SQL sequential
                # fold at ~1e-16, so ranking on the raw double could flip
                # near-tied candidates vs the oracle. Rounding BEFORE the
                # ranking makes both engines order identical values.
                col = np.round(scores[:, j], 6)
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                take = min(k, len(cand_idx))
                if take == 0:
                    continue
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:take]
                top = cand_idx[order]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[top],
                            "raw_score": col[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    corpus = _normalized(emb, "id", "v", id_col, vec_col)
    partial = corpus.mapInPandas(score_batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # already rounded in the batch stage; re-round is a no-op
            # kept for schema clarity
            F.round("raw_score", 6).alias("score"),
        )
    )


def _hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash recurrence.

    No RNG dependency: component d of plane j is derived from a 64-bit
    mix of (j, d), mapped to [-0.5, 0.5). Fixed across runs and engines.
    """
    comps = []
    for d in range(dim):
        x = (plane_idx * 1_000_003 + d * 7919 + 12345) & 0xFFFFFFFF
        # xorshift mix
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        comps.append((x / 2**32) - 0.5)
    return comps


def lsh_bucket_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join + exact rerank in-bucket.

    Bucket key = sign bits of ``n_planes`` fixed hyperplane projections.
    Queries only score corpus rows sharing their bucket → candidate count
    ~ corpus/2^n_planes per query. Recall is approximate by construction
    (driver records a rows-only check for this operator).

    ``multiprobe=h`` additionally probes every bucket within Hamming
    distance ≤ h of the query's own bucket (the standard multi-probe LSH
    refinement — a near-neighbor that straddles one hyperplane lands one
    bit away). The QUERY side fans out to Σ C(n_planes, i) bucket keys —
    the corpus is still bucketed exactly once and the join stays an
    equi-join on the bucket key, so scored fraction grows to
    ~(1 + n_planes·h)/2^n_planes while the corpus-side plan is unchanged.
    """
    from itertools import combinations

    planes = [_hyperplane(j, dim) for j in range(n_planes)]

    def bucket_key(v: Column, flip: tuple[int, ...] = ()) -> Column:
        bits = [
            F.when(
                dot(v, F.array(*[F.lit(c) for c in planes[j]])) >= 0,
                "0" if j in flip else "1",
            ).otherwise("1" if j in flip else "0")
            for j in range(n_planes)
        ]
        return F.concat(*bits)

    # sign bits are scale-invariant, so bucketing the NORMALIZED vectors
    # gives identical buckets while downstream scoring is one dot product
    corpus = _normalized(emb, "neighbor_id", "cv", id_col, vec_col).withColumn(
        "bucket", bucket_key(F.col("cv"))
    )
    flips: list[tuple[int, ...]] = [()]
    for h in range(1, multiprobe + 1):
        flips.extend(combinations(range(n_planes), h))
    queries = (
        _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
        .withColumn(
            "bucket",
            F.explode(F.array(*[bucket_key(F.col("qv"), fl) for fl in flips])),
        )
    )
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("raw_score", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("raw_score", 6).alias("score"))
    )


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: coarse quantize → probe → exact rerank.

    The coarse quantizer uses the first ``n_centroids`` corpus vectors (by
    id) as centroids — a deterministic stand-in for a k-means codebook (at
    production scale you'd train centroids on a sample; the *plan shape*
    is identical: a ~KB codebook collected once to the driver and inlined
    as literals, never a shuffle). Every corpus vector is assigned to its
    max-cosine centroid in one narrow map stage; queries probe their
    ``nprobe`` nearest centroids and exact-rerank only those inverted
    lists, so the scored fraction is ~nprobe/n_centroids of the corpus —
    sub-linear scan work, one shuffle on the (int) cluster key.
    """
    if codebook is None:
        codebook = [
            row.v
            for row in _normalized(emb, "id", "v", id_col, vec_col)
            .orderBy("id")
            .limit(n_centroids)
            .collect()
        ]  # stand-in codebook; pass train_centroids(...) output for a real one
    centroids = [
        (i, F.array(*[F.lit(float(x)) for x in vec]))
        for i, vec in enumerate(codebook)
    ]

    # Corpus assignment runs over the WHOLE corpus, so it uses the Arrow/
    # NumPy path: one (batch × centroids) matmul per Arrow batch instead
    # of n_centroids interpreted higher-order-function dots per row
    # (HOF lambdas are not codegen'd — at 64 centroids the expression
    # path is ~5× slower). Centroid literals are unit-normalized, so
    # argmax over dot(raw_v, c) equals argmax over cosine; normalization
    # for post-join scoring happens in the same pass.
    #
    # ORACLE PARITY (r07, the embed_ivf_topk / embed_filtered_topk full
    # oracles): the norm is accumulated with a COLUMN LOOP — vectorized
    # across the batch, SEQUENTIAL across dims — so each step is one
    # rounded multiply + one rounded add, bit-identical to
    # `similarity.dot`'s left fold and therefore to DuckDB's
    # list_dot_product (parity proven by the embed_cosine_topk oracle).
    # numpy's (mat*mat).sum(axis=1) would pairwise-sum and drift in
    # final ulps. Only the assignment ARGMAX stays in BLAS: a flipped
    # assignment needs two centroid scores within ~1e-15 relative, and
    # exact ties (duplicate centroids) break the same way in both
    # engines (np.argmax first-max ≡ ORDER BY score DESC, cidx ASC).
    import numpy as np
    import pandas as pd

    cmat_np = np.array(codebook, dtype=np.float64)

    def assign_batches(batches):
        for pdf in batches:
            mat = np.array(list(pdf["cv0"]), dtype=np.float64)
            cluster = np.argmax(mat @ cmat_np.T, axis=1).astype("int32")
            acc = np.zeros(mat.shape[0], dtype=np.float64)
            for j in range(mat.shape[1]):
                acc = acc + mat[:, j] * mat[:, j]
            normed = mat / np.sqrt(acc)[:, None]
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["id"].to_numpy(),
                    "cluster": cluster,
                    "cv": list(normed),
                }
            )

    corpus = emb.select(
        F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("cv0")
    ).mapInPandas(
        assign_batches, schema="neighbor_id long, cluster int, cv array<double>"
    )

    def cluster_scores(v: Column) -> Column:
        return F.array(*[dot(v, c) for _, c in centroids])
    # queries emit their nprobe best clusters: sort (score, idx) structs desc
    probe_list = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    cluster_scores(F.col("qv")),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                        lambda i: i,
                    ),
                    lambda s, i: F.struct(s.alias("score"), i.alias("idx")),
                )
            )
        ),
        1,
        nprobe,
    )
    queries = (
        _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
        .withColumn("probe", F.explode(probe_list))
        .select("query_id", "qv", F.col("probe.idx").cast("int").alias("cluster"))
    )
    scored = (
        corpus.join(F.broadcast(queries), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("raw_score", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("raw_score", 6).alias("score"))
    )


def ivfpq_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    nbits: int = 4,
    rerank: int = 50,
    codebooks=None,
    coarse=None,
) -> DataFrame:
    """IVF-PQ ANN top-k — the production composition of the two scale axes.

    IVF bounds COMPUTE (each query scores only its ``nprobe`` of
    ``n_centroids`` inverted lists, ~nprobe/n_centroids of the corpus);
    PQ bounds MEMORY (scored vectors are m-byte codes via ADC lookup
    tables, 32× smaller than float64 raws). One fused Arrow stage over
    the corpus does coarse assignment (batch × centroids matmul), PQ
    encode, and per-query ADC scoring of ONLY the rows whose cluster is
    in that query's probe set — at rest the (cluster, codes) table is
    what you'd store, and the scan reads nothing else. The top
    ``rerank`` candidates per query then exact-rerank against raw
    vectors, bounding approximation to recall loss inside the candidate
    set (surfaced by the registry query's recall@k column).

    Plan shape: corpus scan → mapInPandas (assign+encode+ADC, broadcast
    LUTs + probe sets) → window top-rerank → candidate join to raw
    vectors → window top-k. Shuffles carry ≤ rerank×|queries| candidate
    rows + the final k×|queries|; raw vectors cross no shuffle until
    pruned to candidates. Coarse centroids follow ``ivf_topk``'s
    deterministic stand-in (first n_centroids corpus vectors) unless a
    trained codebook is passed.
    """
    import numpy as np
    import pandas as pd

    corpus = _normalized(emb, "id", "v", id_col, vec_col)
    if coarse is None:
        coarse = [
            row.v for row in corpus.orderBy("id").limit(n_centroids).collect()
        ]
    cmat = np.array(coarse, dtype=np.float64)
    if codebooks is None:
        codebooks = train_pq_codebooks(emb, id_col, vec_col, m=m, nbits=nbits)
    books = np.asarray(codebooks, dtype=np.float64)
    m_, ksub, dsub = books.shape

    queries = (
        _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
        .orderBy("query_id")
        .collect()
    )
    qids = np.array([r.query_id for r in queries], dtype=np.int64)
    qmat = np.array([r.qv for r in queries], dtype=np.float64)
    nq = len(qids)
    # ORACLE PARITY (r07, same recipe as pq_topk/ivf_topk): probe dots
    # and LUTs accumulate with dim-sequential column loops (bit-identical
    # to the SQL left fold); the probe argsort is STABLE so exact score
    # ties pick the lowest centroid index, matching the oracle's
    # ORDER BY score DESC, cidx ASC. Only the corpus-assignment argmax
    # stays in BLAS (ulp-tie argument as in ivf_topk).
    qcs = np.zeros((nq, cmat.shape[0]), dtype=np.float64)
    for d in range(qmat.shape[1]):
        qcs = qcs + qmat[:, d, None] * cmat[None, :, d]
    probes = np.argsort(-qcs, axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)
    luts = np.zeros((nq, m_, ksub), dtype=np.float64)
    for j in range(m_):
        acc = np.zeros((nq, ksub), dtype=np.float64)
        for d in range(dsub):
            acc = acc + qmat[:, j * dsub + d, None] * books[j][None, :, d]
        luts[:, j] = acc

    def assign_encode_scan(batches):
        for pdf in batches:
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            nid = pdf["neighbor_id"].to_numpy()
            n = mat.shape[0]
            cluster = np.argmax(mat @ cmat.T, axis=1)
            codes = np.empty((n, m_), dtype=np.int64)
            for j in range(m_):
                acc = np.zeros((n, ksub), dtype=np.float64)
                for d in range(dsub):
                    diff = mat[:, j * dsub + d, None] - books[j][None, :, d]
                    acc = acc + diff * diff
                codes[:, j] = acc.argmin(axis=1)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                hit = np.nonzero(
                    np.isin(cluster, probes[qi]) & (nid != qids[qi])
                )[0]
                if not len(hit):
                    continue
                scores = np.zeros(len(hit), dtype=np.float64)
                for j in range(m_):
                    scores = scores + luts[qi, j, codes[hit, j]]
                take = min(rerank, len(hit))
                if len(hit) > take:
                    # tie-safe prune (see pq_topk): keep boundary ties
                    # so the candidate set is batching-independent
                    part = np.argpartition(-scores, take - 1)
                    thresh = scores[part[take - 1]]
                    keep = scores >= thresh
                    top, sc = hit[keep], scores[keep]
                else:
                    top, sc = hit, scores
                out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
                out_n.append(nid[top])
                out_s.append(sc)
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "approx": np.concatenate(out_s),
                    }
                )

    cand = corpus.withColumnRenamed("id", "neighbor_id").mapInPandas(
        assign_encode_scan, schema="query_id long, neighbor_id long, approx double"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        cand.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= rerank)
        .drop("rn", "approx")
    )
    qdf = emb.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qmat)],
        "query_id long, qv array<double>",
    )
    exact = (
        cand.join(corpus.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("raw_score", dot(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("raw_score", 6).alias("score"))
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (brute-force baseline).

    All-pairs self-join with cosine ≥ threshold — the oracle-checkable
    ground truth that the LSH variant (``embedding_near_duplicates``)
    approximates. Quadratic in corpus size: use only at verification scale
    or within LSH/IVF-pruned candidate sets.
    """
    base = _normalized(emb, "id", "v", id_col, vec_col)
    return (
        base.alias("a")
        .join(base.alias("b"), F.col("a.id") < F.col("b.id"))
        .withColumn("raw", dot(F.col("a.v"), F.col("b.v")))
        .filter(F.col("raw") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("raw", 6).alias("score"),
        )
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    bands: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH + exact verification.

    ``bands=None`` (legacy single-table shape): pairs sharing the FULL
    n_planes-bit bucket — same-bucket probability for a true pair is
    (1 − θ/π)^n_planes, fine for very high thresholds only.

    ``bands=b`` (the scale path, minhash-style OR-of-ANDs): the
    signature splits into b bands of r = n_planes/b bits; a pair is a
    candidate if ANY band matches, recall 1 − (1 − p^r)^b with
    p = 1 − θ/π — e.g. τ = 0.4 (p ≈ 0.63), 8 planes × 4 bands gives
    ~0.87 recall where the single-bucket table retrieves ~2%.
    Candidates dedup on (id_a, id_b) BEFORE the exact-cosine verify so
    a pair agreeing in several bands is scored once, and the verify
    re-joins vectors by id instead of carrying 2×dim doubles through
    the distinct. Each bit expression appears exactly once in the band
    array so Catalyst's projection collapse can't multiply the dot
    products (the HOF-duplication gotcha).
    """
    if bands is not None and n_planes % bands != 0:
        raise ValueError(f"n_planes={n_planes} not divisible by bands={bands}")
    planes = [_hyperplane(j, dim) for j in range(n_planes)]
    base = _normalized(emb, "id", "v", id_col, vec_col)
    bits = [
        F.when(
            dot(F.col("v"), F.array(*[F.lit(c) for c in planes[j]])) >= 0, "1"
        ).otherwise("0")
        for j in range(n_planes)
    ]

    def verify(with_vecs: DataFrame) -> DataFrame:
        return (
            with_vecs.withColumn("score", dot(F.col("va"), F.col("vb")))
            .filter(F.col("score") >= threshold)
            .select("id_a", "id_b", F.round("score", 6).alias("score"))
        )

    if bands is None:
        bucketed = base.withColumn("bucket", F.concat(*bits))
        return verify(
            bucketed.alias("a")
            .join(bucketed.alias("b"), "bucket")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.v").alias("va"),
                F.col("b.v").alias("vb"),
            )
        )
    r = n_planes // bands
    band_keys = F.array(
        *[
            F.concat(F.lit(f"{bi}:"), *bits[bi * r : (bi + 1) * r])
            for bi in range(bands)
        ]
    )
    keyed = base.select("id", F.explode(band_keys).alias("bkey"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), "bkey")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return verify(
        cand.join(
            base.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
        ).join(
            base.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b"
        )
    )


def preprocess_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Embedding preprocessing battery: L2 norm, normalized stats, int8
    quantization — pure array-expression projection, no shuffle.

    Quantization is symmetric absmax int8 (q = floor(x * 127 / absmax
    + 0.5)): every operation (mul/div/floor) is IEEE-correctly-rounded,
    so the int codes are bit-identical across engines — the oracle
    compares an md5 over the comma-joined codes. Zero vectors quantize to
    all-zero with scale NULL.

    Output: (id, dim, l2_norm, mean_val, absmax, q_md5).
    """
    v = _dvec(F.col(vec_col))
    dim = F.size(v)
    l2 = F.sqrt(dot(v, v))
    mean = F.try_divide(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), dim)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        absmax > 0,
        F.transform(v, lambda x: F.floor(x * 127.0 / absmax + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    q_csv = F.array_join(F.transform(q, lambda x: x.cast("string")), ",")
    return df.select(
        F.col(id_col).alias("id"),
        dim.cast("long").alias("dim"),
        l2.alias("l2_norm"),
        mean.alias("mean_val"),
        absmax.alias("absmax"),
        F.md5(q_csv).alias("q_md5"),
    )


def train_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
    sample_mod: int = 1,
) -> list[list[float]]:
    """Distributed Lloyd iterations for the IVF codebook.

    Seeds from the first ``n_centroids`` vectors (deterministic), then
    refines: assignment is the same Arrow/NumPy matmul the IVF probe path
    uses; the centroid update posexplodes assigned vectors to
    (cluster, dim_idx, val) rows and means them — the shuffle carries
    O(n_centroids x dim) groups regardless of corpus size, which is the
    scale-safe way to average vectors without collecting them. Train on a
    SAMPLE at 100 TB (``sample_mod`` keeps every k-th vector by id hash):
    codebook quality needs thousands of points per centroid, not the
    whole corpus. Returns the codebook as plain Python lists (a few KB)
    to inline as literals downstream.

    Honest measurement on the driver's SYNTHETIC embeddings (isotropic,
    500 vectors): trained and stand-in codebooks tie at nprobe=4 (0.92
    recall) and training is WORSE at nprobe=1-2 — k-means on
    structure-free data tightens cells and splits query neighborhoods
    across boundaries. The trainer exists for real corpora, where
    embeddings cluster and the codebook must follow the density; on
    isotropic data the probe fraction alone governs recall.
    """
    import numpy as np
    import pandas as pd

    # SPHERICAL k-means: cosine assignment is a dot against unit vectors,
    # so train on normalized inputs and re-normalize means every round —
    # training on raw vectors optimizes euclidean structure the cosine
    # probe never sees (measured: it made recall slightly WORSE).
    src = _normalized(emb, "id", "v", id_col, vec_col)
    if sample_mod > 1:
        src = src.filter(F.pmod(F.xxhash64("id"), F.lit(sample_mod)) == 0)
    src = src.localCheckpoint(eager=True)  # reused every iteration
    cmat = np.array(
        [r.v for r in src.orderBy("id").limit(n_centroids).collect()],
        dtype=np.float64,
    )
    for _ in range(iters):
        cmat_b = cmat

        def assign(batches):
            for pdf in batches:
                mat = np.array(list(pdf["v"]), dtype=np.float64)
                cl = np.argmax(mat @ cmat_b.T, axis=1).astype("int32")
                yield pd.DataFrame({"cluster": cl, "v": pdf["v"]})

        assigned = src.mapInPandas(assign, schema="cluster int, v array<double>")
        means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cmat.copy()  # clusters that lost all members keep old center
        for r in means:
            new[r["cluster"]][r["dim"]] = r["m"]
        norms = np.sqrt((new * new).sum(axis=1))
        norms[norms == 0] = 1.0
        cmat = new / norms[:, None]
    return [list(map(float, row)) for row in cmat]


_PQ_BOOK_CACHE: dict = {}


def standin_pq_codebooks(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
):
    """Deterministic stand-in PQ codebooks: subvector ``j`` of the first
    ``2^nbits`` NORMALIZED corpus vectors (by id) is subspace ``j``'s
    codeword set — the same no-training stand-in ``ivf_topk`` uses for
    its coarse quantizer, applied per subspace. Drawn from the actual
    data distribution, it measures BETTER than the trained k-means
    fixture on this corpus (recall@5 0.90 vs 0.84 at sf0.01, 0.80 vs
    0.74 at sf0.1) and, unlike a trained artifact, is re-derivable in
    SQL from the embeddings table alone — which is what lets
    ``embed_pq_topk`` carry a full DuckDB oracle. Production trains
    real codebooks (``train_pq_codebooks``) and passes them via the
    ``codebooks`` param; the plan shape is identical.
    """
    ksub = 1 << nbits
    first = [
        r.v
        for r in _normalized(emb, "id", "v", id_col, vec_col)
        .orderBy("id")
        .limit(ksub)
        .collect()
    ]
    d = len(first[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [list(v[j * dsub : (j + 1) * dsub]) for v in first] for j in range(m)
    ]


def train_pq_codebooks(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    sample_n: int = 2048,
    iters: int = 4,
):
    """Per-subspace k-means codebooks for product quantization.

    PQ training needs ksub=2^nbits centroids per subspace over a SAMPLE
    (thousands of points suffice — Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011); the sample is collected
    once to the driver and the m small k-means run in NumPy there. The
    corpus never moves: only the (m × ksub × dsub) codebook array — a few
    KB — ships back out as a broadcast. Deterministic: seeds from the
    first ksub sample vectors per subspace, no RNG.

    Returns a (m, ksub, dsub) float64 ndarray over NORMALIZED vectors.
    """
    import numpy as np

    ksub = 1 << nbits
    sample = np.array(
        [
            r.v
            for r in _normalized(emb, "id", "v", id_col, vec_col)
            .orderBy("id")
            .limit(sample_n)
            .collect()
        ],
        dtype=np.float64,
    )
    d = sample.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(iters):
            # euclidean assignment within the subspace
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


def load_or_train_pq_codebooks(
    emb: DataFrame,
    corpus_key: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
):
    """Load PQ codebooks from the on-disk fixture store, training once if absent.

    Codebooks are training ARTIFACTS (a few KB): in production they live
    in the catalog next to the code table and every query just reads
    them. This helper gives the same economics locally — the first call
    per (corpus, m, nbits) trains and persists an .npy under
    ``dbt_repo_spark/fixtures/``; every later call (including fresh
    processes, e.g. the bench) is a pure file read, so the ANN query
    plan contains no training collect.

    The filename carries a cheap corpus fingerprint (row count + id-hash
    fold, one column-pruned aggregate) so regenerated data at the same
    path retrains instead of silently reusing stale codebooks; a
    read-only package install falls back to in-memory training instead
    of raising on the save.
    """
    import numpy as np

    n_rows, id_fold = emb.agg(
        F.count("*"), F.sum(F.crc32(F.col(id_col).cast("string")) % F.lit(1000003))
    ).first()
    fp = f"n{n_rows}_h{int(id_fold or 0) % 10**9}"
    safe = "".join(ch if ch.isalnum() else "_" for ch in corpus_key)
    path = _FIXTURES_DIR / f"pq_codebooks_{safe}_{fp}_m{m}_b{nbits}.npy"
    if path.exists():
        return np.load(path)
    books = train_pq_codebooks(emb, id_col, vec_col, m=m, nbits=nbits)
    try:
        _FIXTURES_DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.npy")
        np.save(tmp, books)
        tmp.replace(path)
    except OSError:
        pass  # read-only install: keep the in-memory codebooks
    return books


def pq_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    rerank: int = 50,
    codebooks=None,
) -> DataFrame:
    """Product-quantization ANN top-k: encode → ADC scan → exact rerank.

    The MEMORY scale path of the ANN family: each normalized corpus
    vector is encoded as m sub-space codebook indices (m bytes at
    nbits<=8 — 32× smaller than float64×dim), so a 100 TB embedding
    corpus scans as ~3 TB of codes. Scoring is asymmetric distance
    computation: each query precomputes an (m × ksub) lookup table of
    partial dot products, and a corpus code scores with m table gathers
    + a sum — one NumPy gather per Arrow batch, no decode. The top
    ``rerank`` candidates per query are then exact-reranked against raw
    vectors, which bounds the approximation to recall loss inside the
    candidate set only.

    Plan shape: encode + ADC run FUSED in one mapInPandas over the
    corpus (at rest the codes would be the stored table; in-flight there
    is no reason to materialize them through a second Python stage —
    fusing halved wall-clock at sf0.1). The scan broadcasts only the
    query LUTs (m×ksub×|queries| doubles); candidates shuffle ≤
    rerank×|queries| rows into the exact rerank join. No shuffle touches
    raw corpus vectors until the candidate join prunes them to the
    rerank set.
    """
    import numpy as np
    import pandas as pd

    if codebooks is None:
        # Codebooks are training ARTIFACTS: in production they're
        # computed once and stored next to the codes. Memoizing on the
        # corpus plan's semantic hash gives repeated queries over the
        # same corpus that economics instead of retraining per call.
        key = (emb.semanticHash(), id_col, vec_col, m, nbits)
        codebooks = _PQ_BOOK_CACHE.get(key)
        if codebooks is None:
            codebooks = train_pq_codebooks(emb, id_col, vec_col, m=m, nbits=nbits)
            _PQ_BOOK_CACHE[key] = codebooks
    books = np.asarray(codebooks, dtype=np.float64)
    m_, ksub, dsub = books.shape

    corpus = _normalized(emb, "id", "v", id_col, vec_col)

    queries = (
        _normalized(emb.filter(query_pred), "query_id", "qv", id_col, vec_col)
        .orderBy("query_id")
        .collect()
    )
    qids = np.array([r.query_id for r in queries], dtype=np.int64)
    qmat = np.array([r.qv for r in queries], dtype=np.float64)
    nq = len(qids)
    # LUT[q, j, c] = <q_subvec_j, codebook[j][c]> ; approx score = sum_j LUT[q, j, code_j]
    # ORACLE PARITY (r07): every reduction below runs as a DIM-SEQUENTIAL
    # column loop — vectorized across rows, ordered across the reduced
    # axis — so each step is one rounded multiply/subtract + one rounded
    # add, bit-identical to a SQL left fold (the ivf_topk recipe). BLAS
    # matmuls / np.sum pairwise reductions would drift in final ulps and
    # break the embed_pq_topk oracle's exact rank reproduction.
    luts = np.zeros((nq, m_, ksub), dtype=np.float64)
    for j in range(m_):
        acc = np.zeros((nq, ksub), dtype=np.float64)
        for d in range(dsub):
            acc = acc + qmat[:, j * dsub + d, None] * books[j][None, :, d]
        luts[:, j] = acc

    def encode_and_scan(batches):
        for pdf in batches:
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            nid = pdf["neighbor_id"].to_numpy()
            n = mat.shape[0]
            codes = np.empty((n, m_), dtype=np.int64)
            for j in range(m_):
                acc = np.zeros((n, ksub), dtype=np.float64)
                for d in range(dsub):
                    diff = mat[:, j * dsub + d, None] - books[j][None, :, d]
                    acc = acc + diff * diff
                codes[:, j] = acc.argmin(axis=1)
            take = min(rerank, n)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                scores = np.zeros(n, dtype=np.float64)
                for j in range(m_):
                    scores = scores + luts[qi, j, codes[:, j]]
                idx = np.nonzero(nid != qids[qi])[0]
                if len(idx) > take:
                    # tie-SAFE prune: keep every row scoring >= the
                    # take-th best, not exactly `take` rows — ties at
                    # the boundary would otherwise make the candidate
                    # set depend on Arrow batching (argpartition keeps
                    # an arbitrary tied member), and the global
                    # (approx DESC, id ASC) window downstream could
                    # then disagree with the oracle's deterministic
                    # pick. A superset is lossless: the window prunes
                    # it to the exact deterministic top-`rerank`.
                    part = np.argpartition(-scores[idx], take - 1)
                    thresh = scores[idx[part[take - 1]]]
                    top = idx[scores[idx] >= thresh]
                else:
                    top = idx
                out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
                out_n.append(nid[top])
                out_s.append(scores[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx": np.concatenate(out_s),
                }
            )

    cand = corpus.withColumnRenamed("id", "neighbor_id").mapInPandas(
        encode_and_scan, schema="query_id long, neighbor_id long, approx double"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    cand = cand.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") <= rerank
    ).drop("rn", "approx")

    qdf = emb.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qmat)],
        "query_id long, qv array<double>",
    )
    exact = (
        cand.join(corpus.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("raw_score", dot(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("raw_score", 6).alias("score"))
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.92,
    iters: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with spherical k-means,
    then mark, WITHIN each cluster, every vector that has cosine >=
    ``threshold`` with a lower-id cluster-mate as a duplicate (keep-min-id
    is this engine's deterministic stand-in for the paper's
    keep-farthest-from-centroid tie-break).

    Scale shape: the quadratic comparison never touches the corpus — it
    runs per CLUSTER, and cluster count grows with the corpus (SemDeDup
    uses 50k clusters for LAION-scale) so cluster SIZE stays ~constant;
    total work is O(n_clusters x avg_size²) with one shuffle on the int
    cluster key. The codebook comes from ``ivf_retrain``'s order-exact
    spherical Lloyd (r07; train_centroids remains the float-mean
    variant for callers that don't need cross-engine parity) and is
    inlined as literals — no training shuffle in this plan.

    Self-validation: intra-cluster qualifying pairs are a SUBSET of the
    exact all-pairs near-dup set by construction, so pair_recall =
    |intra| / |exact| measures exactly what clustering loses (cross-
    cluster near-dups). Emitted as a constant column. The exact side is
    measured on a SEEDED 50% id sample (both endpoints in-sample → ~25%
    of pairs audited), the same audit pattern as dedup_minhash_lsh's
    sampled_pair_recall (r03 verdict: a full-strength quadratic audit
    merely relocates the cost SemDeDup exists to avoid — at 100 TB the
    ground-truth side can only ever run on a sample, and the estimator
    is binomial over the sampled true pairs).

    Output: (id, cluster, is_duplicate, pair_recall).
    """
    import numpy as np
    import pandas as pd

    # ORACLE PARITY (r07): the codebook comes from ivf_retrain's
    # order-exact spherical Lloyd (DECIMAL-folded component means,
    # sequential-fold assignment dots) instead of train_centroids'
    # float-mean variant — bit-identical across engines and therefore
    # unrollable in the dedup_semantic oracle. Normalization below is
    # the dim-sequential column loop (≡ the SQL left fold); only the
    # cluster argmax stays in BLAS (ulp-tie argument as in ivf_topk).
    codebook = ivf_retrain(
        emb, k=n_clusters, n_iters=iters, id_col=id_col, vec_col=vec_col
    )
    cmat_np = np.array(codebook, dtype=np.float64)

    def assign_batches(batches):
        for pdf in batches:
            mat = np.array(list(pdf["cv0"]), dtype=np.float64)
            cluster = np.argmax(mat @ cmat_np.T, axis=1).astype("int32")
            acc = np.zeros(mat.shape[0], dtype=np.float64)
            for d in range(mat.shape[1]):
                acc = acc + mat[:, d] * mat[:, d]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cluster": cluster,
                    "v": list(mat / np.sqrt(acc)[:, None]),
                }
            )

    assigned = (
        emb.select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("cv0"))
        .mapInPandas(assign_batches, schema="id long, cluster int, v array<double>")
        .persist()
    )
    intra = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("raw", dot(F.col("a.v"), F.col("b.v")))
        .filter(F.col("raw") >= F.lit(threshold))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
    )
    dups = intra.select(F.col("id_b").alias("id")).distinct()
    # md5-folded sample (engine-portable; same convention as
    # dedup_minhash_lsh's audit sample)
    in_sample = lambda c: (  # noqa: E731
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("s|"), F.col(c).cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0
    )
    exact_n = (
        cosine_pairs(
            emb.filter(in_sample(id_col)), threshold, id_col, vec_col
        )
        .agg(F.count("*").alias("__n_exact"))
    )
    recall = (
        intra.filter(in_sample("id_a") & in_sample("id_b"))
        .agg(F.count("*").alias("__n_intra"))
        .crossJoin(F.broadcast(exact_n))
        .select(
            F.when(
                F.col("__n_exact") > 0,
                F.round(F.col("__n_intra") / F.col("__n_exact"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("pair_recall")
        )
    )
    return (
        assigned.join(dups.withColumn("__dup", F.lit(True)), "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce("__dup", F.lit(False)).alias("is_duplicate"),
        )
        .crossJoin(F.broadcast(recall))
    )


def embed_text_stub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 16,
) -> DataFrame:
    """Deterministic text-embedding SEAM: the Spark-side plumbing of an
    embedding-generation stage (Arrow batching, unit normalization,
    schema) with the model call replaced by a content-addressed fake —
    component j of a text's vector derives from md5(text || ':' || j),
    mapped to [-1, 1) and L2-normalized. Swap the inner function for a
    real encoder (sentence-transformers, an inference endpoint) with
    the same signature in production — the multimodal ``real_decode``
    seam contract applied to text. Deterministic by construction:
    identical text → identical vector, any partitioning, any engine.

    Output: (id, embedding array<float>, norm_prenorm double). The
    pre-normalization norm rides along as the plumbing's sanity
    certificate (a constant-ish value near sqrt(dim/3) for the fake;
    a real encoder's own scale in production).
    """
    import hashlib
    import math

    import pandas as pd

    def embed_batches(batches):
        for pdf in batches:
            vecs, norms = [], []
            for text in pdf[text_col].astype(str):
                comps = []
                for j in range(dim):
                    h = hashlib.md5(f"{text}:{j}".encode()).hexdigest()
                    comps.append(int(h[:8], 16) / 2147483648.0 - 1.0)
                n = math.sqrt(sum(c * c for c in comps))
                vecs.append([c / n for c in comps] if n > 0 else comps)
                norms.append(n)
            yield pd.DataFrame(
                {"id": pdf[id_col], "embedding": vecs, "norm_prenorm": norms}
            )

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        embed_batches,
        schema=f"id long, embedding array<float>, norm_prenorm double",
    ).withColumnRenamed("id", id_col)


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (r07) — the similarity family's
# production tick, mirroring the dedup family's batch-vs-persisted-index
# shape (operators/dedup.py::incremental_paragraph_rewrite): a corpus
# that gains embeddings continuously must EXTEND its ANN index, not
# rebuild it. Reference analog: the incremental anti-join append
# (/root/reference/models/facts/fact_station_status.sql:30-32) applied
# to the postings relation.
# ---------------------------------------------------------------------------


def ivf_assign(
    emb: DataFrame,
    codebook: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Assign vectors to their max-cosine centroid: (vec_id, cluster,
    ascore) postings — the IVF index's row type.

    ``exact=True`` (default) scores with the engine's sequential-fold
    ``dot`` over unit-normalized doubles, bit-reproducible against a
    DuckDB ``list_dot_product`` oracle (ties break to the smallest
    cluster id via a (score, -idx) struct max). ``exact=False`` is the
    Arrow/NumPy matmul fast path (same as ivf_topk's corpus stage) for
    corpora where 16 interpreted HOF dots per row start to matter —
    identical assignments except on float-ulp near-ties, which is why
    the ORACLE-CHECKED path stays on the expression fold.
    """
    if not exact:
        import numpy as np
        import pandas as pd

        cmat = np.array(codebook, dtype=np.float64)

        def assign(batches):
            for pdf in batches:
                mat = np.array(list(pdf["v0"]), dtype=np.float64)
                norms = np.sqrt((mat * mat).sum(axis=1))
                norms[norms == 0] = 1.0
                normed = mat / norms[:, None]
                scores = normed @ cmat.T
                cl = np.argmax(scores, axis=1).astype("int32")
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["id"].to_numpy(),
                        "cluster": cl,
                        "ascore": scores[np.arange(len(cl)), cl],
                    }
                )

        return (
            fan_out(emb)
            .select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v0"))
            .mapInPandas(assign, schema="vec_id long, cluster int, ascore double")
        )

    normed = _normalized(emb, "vec_id", "v", id_col, vec_col)
    return _assign_normed(normed, codebook)


def _assign_normed(normed: DataFrame, codebook: list[list[float]]) -> DataFrame:
    """(vec_id, cluster, ascore) over a PRE-normalized (vec_id, v)
    relation — the assignment shared by ``ivf_assign``'s exact path and
    the ``ivf_retrain`` Lloyd loop. The retrain loop must score the
    SAME normalized doubles on every iteration (re-normalizing an
    already-unit vector divides by a ~1.0-but-not-exactly-1.0 norm and
    shifts ulps the SQL oracle would then have to replicate).

    r07: runs as an Arrow/NumPy stage with a DIM-SEQUENTIAL column loop
    — vectorized across the batch, one rounded multiply + one rounded
    add per dim — so every score stays bit-identical to the expression
    fold it replaced (≡ DuckDB list_dot_product), while dropping the
    interpreted-HOF cost that made the Lloyd iterations the slow leg of
    dedup_semantic (~5× on the assignment pass). np.argmax's first-max
    tie-break ≡ the old max(s, -idx) struct ≡ ORDER BY s DESC, cl ASC.
    """
    import numpy as np
    import pandas as pd

    cmat = np.array(codebook, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            if mat.size == 0:
                continue
            n = mat.shape[0]
            scores = np.zeros((n, cmat.shape[0]), dtype=np.float64)
            for d in range(cmat.shape[1]):
                scores = scores + mat[:, d, None] * cmat[None, :, d]
            cl = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": cl.astype("int32"),
                    "ascore": scores[np.arange(n), cl],
                }
            )

    return normed.select("vec_id", "v").mapInPandas(
        assign, schema="vec_id long, cluster int, ascore double"
    )


def _read_ivf_index(spark, index_dir: str, exclude_batch: int) -> DataFrame:
    """Postings published by previous ticks (empty relation before the
    first publish); ``exclude_batch`` hides the current batch's own
    partition so a crash-replay never treats its half-write as corpus —
    same contract as streaming/dedup_stream.py::_read_index."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return spark.createDataFrame(
            [], "vec_id long, cluster int, ascore double, batch long"
        )
    return spark.read.parquet(index_dir).filter(
        F.col("batch") != F.lit(exclude_batch)
    )


def ivf_index_upsert(
    spark,
    new_vecs: DataFrame,
    batch_id: int,
    index_dir: str,
    codebook: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    drift_threshold: float = 0.05,
) -> DataFrame:
    """One index-maintenance tick: assign a NEW batch of vectors to the
    EXISTING centroids, append its postings under a ``batch=<id>``
    partition (dynamic overwrite -> idempotent crash-replay), and return
    the per-cell drift statistics that decide when to RETRAIN.

    At-least-once collapse mirrors the dedup tick: duplicates within the
    batch drop, and vec_ids already in the index anti-join away (a
    redelivered vector must not create a second posting). The tick never
    touches corpus vectors — the only join is batch-postings vs the
    postings table on the 4-byte cluster key for the drift stats, so a
    tick's cost is bounded by the batch, not the corpus.

    Drift signal (per cluster): corpus vs batch assignment-score means
    (a falling batch mean = new data far from the codebook's cells) and
    fill counts (one cell swallowing the batch = density moved).
    ``retrain`` = batch mean more than ``drift_threshold`` below the
    corpus mean on a cell with batch arrivals. Score means accumulate as
    DECIMAL(20,6) over 6-dp-rounded scores (order-independent exact
    sums, ONE final IEEE division) so even the float columns
    hash-match a SQL oracle.
    """
    existing = _read_ivf_index(spark, index_dir, exclude_batch=batch_id)
    batch = new_vecs.dropDuplicates([id_col]).join(
        existing.select(F.col("vec_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    postings = ivf_assign(batch, codebook, id_col, vec_col, exact=exact)
    (
        postings.withColumn("batch", F.lit(batch_id).cast("long"))
        .write.mode("overwrite")
        .options(partitionOverwriteMode="dynamic")
        .partitionBy("batch")
        .parquet(index_dir)
    )
    # drift stats: published corpus (pre-tick) vs this batch's postings —
    # read back from the table so the stats describe what the index
    # actually now holds (and a replayed tick reports identically)
    published = spark.read.parquet(index_dir)
    corpus_side = published.filter(F.col("batch") != F.lit(batch_id))
    batch_side = published.filter(F.col("batch") == F.lit(batch_id))

    def cell_stats(df: DataFrame, n_name: str, avg_name: str) -> DataFrame:
        dec = F.round(F.col("ascore"), 6).cast("decimal(20,6)")
        return df.groupBy("cluster").agg(
            F.count("*").cast("long").alias(n_name),
            (F.sum(dec).cast("double") / F.count("*")).alias(avg_name),
        )
    cells = spark.range(len(codebook)).select(F.col("id").cast("int").alias("cluster"))
    out = (
        cells.join(cell_stats(corpus_side, "n_corpus", "corpus_avg_score"), "cluster", "left")
        .join(cell_stats(batch_side, "n_batch", "batch_avg_score"), "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n_corpus", F.lit(0)).cast("long").alias("n_corpus"),
            F.coalesce("n_batch", F.lit(0)).cast("long").alias("n_batch"),
            "corpus_avg_score",
            "batch_avg_score",
            (F.col("corpus_avg_score") - F.col("batch_avg_score")).alias("score_drift"),
            F.coalesce(
                F.col("batch_avg_score")
                < F.col("corpus_avg_score") - F.lit(drift_threshold),
                F.lit(False),
            ).alias("retrain"),
        )
    )
    return out


def initial_codebook(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic codebook seed: the k smallest-id vectors, unit-
    normalized — the convention every IVF fixture in this module uses
    (reproducible in SQL as ``ORDER BY id LIMIT k``). |k| rows of driver
    traffic, the sanctioned |centroids| collect."""
    return [
        list(r.v)
        for r in _normalized(emb, "id", "v", id_col, vec_col)
        .orderBy("id")
        .limit(k)
        .collect()
    ]


def ivf_retrain(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
) -> list[list[float]]:
    """Retrain the IVF codebook: ``n_iters`` spherical Lloyd steps —
    the RESPONSE to ``ivf_index_upsert``'s ``retrain`` drift flag, and
    the missing third of the index lifecycle (build → upsert → retrain).

    Every step is deterministic and cross-engine exact, so a fixed-
    iteration retrain carries a full DuckDB oracle (unrolled — see the
    ``ann_ivf_retrain`` registry query):

    - assignment scores are the engine's sequential-fold ``dot`` over
      unit-normalized doubles (ties to the smallest cluster) — the
      bit-reproducible ``_assign_normed`` path, identical on every
      iteration because vectors normalize ONCE up front;
    - centroid update accumulates per-(cluster, component) sums as
      DECIMAL(20,6) over 6-dp-rounded components (order-independent
      exact addition — a float sum here would make the result depend on
      partitioning), then ONE IEEE division by the member count;
    - the updated centroid re-normalizes to the unit sphere (spherical
      k-means: cosine assignment needs unit centroids), norm via the
      same sequential fold;
    - an EMPTY cluster keeps its previous centroid (deterministic;
      no random re-seeding).

    Scale shape: per iteration, one broadcast-codebook assignment pass
    over the corpus (k expression dots per row, no shuffle) plus one
    (cluster, component)-keyed partial-aggregable sum — k*dim cells
    regardless of corpus size — and a k-row driver collect (the
    sanctioned |centroids| traffic). At 100 TB one retrains on a
    deterministic sample (``emb.filter(col(id) % m == 0)``) — Lloyd
    quality depends on per-cell sample counts, not the corpus — then
    reassigns the full corpus with the new codebook once.

    Reference analog: the periodic full-refresh rebuild of a derived
    artifact from accumulated data — ``dim_stations`` re-derives the
    current dimension from every snapshot on each run
    (/root/reference/models/dimensions/dim_stations.sql:5-19) — applied
    to the codebook artifact, while ``ivf_index_upsert`` mirrors the
    incremental append between rebuilds
    (/root/reference/models/facts/fact_station_status.sql:30-32).

    Returns the new codebook (list of k unit double vectors).
    """
    cb = init if init is not None else initial_codebook(emb, k, id_col, vec_col)
    if len(cb) != k:
        raise ValueError(f"init codebook has {len(cb)} centroids, expected {k}")
    normed = _normalized(emb, "vec_id", "v", id_col, vec_col).persist()
    try:
        for _ in range(n_iters):
            asg = _assign_normed(normed, cb)
            comp = asg.join(normed, "vec_id").select(
                "cluster", F.posexplode("v").alias("idx", "val")
            )
            means = comp.groupBy("cluster", "idx").agg(
                (
                    F.sum(F.round(F.col("val"), 6).cast("decimal(20,6)")).cast(
                        "double"
                    )
                    / F.count("*")
                ).alias("m")
            )
            packed = (
                means.groupBy("cluster")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "m"))),
                        lambda s: s["m"],
                    ).alias("c")
                )
                .withColumn("__n", F.sqrt(dot(F.col("c"), F.col("c"))))
                .withColumn("c", F.transform("c", lambda x: x / F.col("__n")))
            )
            got = {r.cluster: list(r.c) for r in packed.collect()}
            cb = [got.get(i, cb[i]) for i in range(k)]
    finally:
        normed.unpersist()
    return cb


def lsh_params_for(
    n_vectors: int,
    threshold: float,
    target_recall: float = 0.9,
    target_bucket: int = 64,
    max_planes: int = 512,
) -> tuple[int, int]:
    """(n_planes, bands) for sign-LSH near-dup at a given corpus size —
    the standard LSH parameter solver the r07 scale-growth sweep showed
    is NOT optional: fixed (8 planes, 4 bands) keeps band keys 2 bits
    wide, so every band bucket holds ~N/4 vectors and the candidate
    join is QUADRATIC in N (measured: 2.9s -> 23s from 1x -> 4x corpus,
    output pairs super-linear from cross-bucket collisions). The cure is
    classic OR-of-ANDs tuning: grow the band WIDTH r with log2(N) so
    bucket occupancy stays ~``target_bucket``, then take enough bands b
    that a true pair at ``threshold`` still matches some band with
    probability >= ``target_recall``:

        p = 1 - acos(threshold)/pi          (per-plane sign agreement)
        r = max(2, ceil(log2(N / target_bucket)))
        b = ceil(log(1 - R) / log(1 - p^r))

    Candidate work is then O(b * N * target_bucket) — linear in N with
    a log-factor of planes — instead of O(N^2 / 2^r). When the ideal
    (r, b) would exceed ``max_planes`` (low thresholds on huge corpora
    are plane-hungry: sign agreement p is small, so b must grow fast),
    the solver NARROWS the bands instead of silently capping b — the
    recall target is always met and the cost degrades gracefully into
    larger buckets (more candidate verification), never into a recall
    cliff. Returns (n_planes = r*b, bands = b).
    """
    import math

    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    p = 1.0 - math.acos(threshold) / math.pi
    r_ideal = max(2, math.ceil(math.log2(max(n_vectors, 2) / target_bucket)))

    def bands_for(r: int) -> int:
        return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p**r)))

    for r in range(r_ideal, 1, -1):
        b = bands_for(r)
        if r * b <= max_planes:
            return r * b, b
    b = bands_for(2)  # r=2 always fits any sane max_planes
    return 2 * b, b


def _signature_arrow(
    emb: DataFrame,
    n_planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, sig) sign-LSH bit strings via ONE Arrow/NumPy matmul per
    batch — the signature stage for solver-sized plane counts, where
    the expression path would evaluate hundreds of interpreted HOF dot
    products per row (at 400 planes x 40k vectors that is ~1e9
    interpreted multiply-adds; the matmul path is one BLAS call per
    Arrow batch). Sign bits only — the exact verify downstream uses the
    sequential-fold dot, so approximation never enters the scores."""
    import numpy as np
    import pandas as pd

    pmat = np.array(
        [_hyperplane(j, dim) for j in range(n_planes)], dtype=np.float64
    )

    def sig(batches):
        for pdf in batches:
            mat = np.array(list(pdf["v0"]), dtype=np.float64)
            bits = (mat @ pmat.T) >= 0  # sign is scale-invariant: no normalize
            sigs = [
                "".join("1" if b else "0" for b in row) for row in bits
            ]
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "sig": sigs})

    return (
        fan_out(emb)
        .select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v0"))
        .mapInPandas(sig, schema="id long, sig string")
    )


def embedding_near_duplicates_scaled(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    target_recall: float = 0.8,
    n_vectors: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs with SOLVER-SIZED LSH parameters — the
    fix for the r07 scale-growth finding that fixed (8 planes, 4 bands)
    makes the candidate join quadratic in corpus size. Band width grows
    with log2(N) (bucket occupancy pinned) and band count restores
    ``target_recall`` at ``threshold``; signatures come from the Arrow
    matmul stage (sign bits only — every emitted score is still the
    exact sequential-fold cosine, so precision stays 1.0 and only
    recall is probabilistic). Candidate work per band is O(N x bucket)
    with occupancy pinned — but the BAND COUNT restoring fixed recall
    grows with N (r rises to pin occupancy, p^r shrinks, b =
    ln(1-R)/ln(1-p^r) rises), so total work is the classic LSH bound
    Θ(N^(1+ρ)), ρ = ln(1/p)/ln 2 with p = 1 − θ/π. At the SemDeDup
    deployment threshold τ ≥ 0.9 (p ≈ 0.86, ρ ≈ 0.22) that is
    near-linear — measured 1.43x wall at 10x corpus (SCALE.md r12).
    At recall-stress τ = 0.4 (p ≈ 0.63, ρ ≈ 0.67) no sign-LSH is
    sub-Θ(N^1.67); measured ~N^1.0 on the clustered fixture — better
    than the bound and far better than brute force's N², which is the
    honest claim (the r07 phrasing "linear in N" held only while the
    solver's r was pinned at the fixture's size band).

    ``n_vectors`` skips the sizing count when the caller knows it.
    """
    n = n_vectors if n_vectors is not None else emb.count()
    n_planes, bands = lsh_params_for(n, threshold, target_recall)
    r = n_planes // bands
    sig = _signature_arrow(emb, n_planes, dim, id_col, vec_col)
    band_keys = F.array(
        *[
            F.concat(F.lit(f"{bi}:"), F.substring("sig", bi * r + 1, r))
            for bi in range(bands)
        ]
    )
    keyed = sig.select("id", F.explode(band_keys).alias("bkey"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), "bkey")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    base = _normalized(emb, "id", "v", id_col, vec_col)
    return (
        cand.join(
            base.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
        )
        .join(base.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("score", dot(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )
