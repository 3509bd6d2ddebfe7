"""Round-12 addition: the bounded-recall entity-resolution scale path.

The r12 sf1-class measurement (SCALE.md r12) confirmed what
`entity_resolution_docs`'s docstring argues: with a FIXED
(lang x length-bucket) blocking key space, exact-recall edit-distance
comparison is Θ(N²/blocks) — block sizes grow with the corpus, and at
10x corpus the comparator stage measured exponent 1.24. That is the
honest contract for exact recall; production ER systems at corpus
scale trade recall for a linear comparator via SORTED-NEIGHBORHOOD
blocking (Hernández & Stolfo 1995, the merge/purge method): sort the
corpus by a discriminating key, compare each record only against its w
successors. Candidates are O(N·w); recall is bounded by the sort key's
ability to place true matches within a window — heuristic, stated, and
exactly reproducible.

No reference equivalent (the reference has no ER surface); family
anchor: SURVEY.md §2's training-data extension ops,
`queries.py::entity_resolution_docs` (the exact-recall sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.queries import q, t

_SN_WINDOW = 8  # successors compared per record (w)
_SN_EDIT = 12  # same comparator contract as entity_resolution_docs


@q(
    "entity_resolution_sorted_neighborhood",
    f"""
    WITH RECURSIVE
      d AS (SELECT doc_id, lang, substr(text, 1, 24) AS head
            FROM documents),
      r AS (SELECT doc_id, lang, head,
                   row_number() OVER (ORDER BY lang, head, doc_id) AS rn
            FROM d),
      edges AS (SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
                       GREATEST(a.doc_id, b.doc_id) AS id_b
                FROM r a JOIN r b
                  ON b.rn > a.rn AND b.rn <= a.rn + {_SN_WINDOW}
                 AND a.lang = b.lang
                WHERE levenshtein(a.head, b.head) <= {_SN_EDIT}),
      bidir AS (SELECT id_a AS src, id_b AS dst FROM edges
                UNION SELECT id_b, id_a FROM edges),
      cc(node, label) AS (
        SELECT src, src FROM bidir
        UNION
        SELECT b.dst, cc.label FROM cc JOIN bidir b ON b.src = cc.node
      )
    SELECT node AS doc_id, MIN(label) AS cluster_id,
           node = MIN(label) AS is_canonical
    FROM cc GROUP BY node
    """,
)
def entity_resolution_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood entity resolution — the O(N·w) comparator.

    Plan: a GLOBAL total-order rank over (lang, head, doc_id) computed
    two-phase (range repartition → per-partition local rank → add the
    |partitions|-row offset map — the `ordered_prefix_sums` seam, NOT a
    single-partition window: at 100 TB a per-lang `row_number` window
    lands each language's full sort on one task), then each record
    equi-joins its w = 8 rank-successors (probe side explodes the 8
    neighbor ranks, so the join is a plain integer equi-join that
    shuffles on rank — no range join, no skew: every rank key has
    exactly ≤ 9 rows across both sides), keeps same-lang pairs within
    levenshtein ≤ 12 on the 24-char head (the exact sibling's
    comparator contract), and closes transitively with pointer-jumping
    connected components. Ranks within a language are contiguous in the
    global order, so the global-rank window plus the lang equality is
    IDENTICAL to a per-lang neighborhood of width w.

    Recall contract (stated, not hidden): sorted-neighborhood finds a
    true match only if the two heads sort within w of each other —
    edit-close strings with different first characters can be missed.
    That is the documented production trade for corpus-scale ER; the
    exact-recall sibling (`entity_resolution_docs`) remains the
    ground-truth path at Θ(N²/blocks).

    Exactness: the rank is a deterministic total order (head ties break
    by doc_id), both engines run the same levenshtein and the same
    min-id transitive closure — full value oracle (single recursive
    SQL statement), same output shape as the sibling. Note the window
    join here has NO length-bucket filter — sorted adjacency replaces
    it — so the pair CONTRACT differs from the sibling's (that is the
    recall trade, not a bug).

    Known skew mode (measured on the r12 replica corpus): if the sort
    order chains near-identical heads across the whole corpus (the
    token-suffix replica transform manufactures exactly that), the
    components merge into one giant cluster and the CC label key
    skews to a single reducer — a DATA pathology (adversarially
    self-similar corpus), not a plan property; real corpora produce
    small local clusters. The CC round cap (max_iter=25) bounds the
    damage either way.
    """
    from dbt_repo_spark.operators.evalmetrics import ordered_prefix_sums
    from dbt_repo_spark.operators.graph import dedup_clusters

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 24).alias("head"),
    )
    # two-phase global rank over the struct key (exclusive prefix count
    # of ones = 0-based rank; +1 for the 1-based rn both engines agree
    # on). ordered_prefix_sums range-partitions on the key, so no
    # single-partition exchange anywhere.
    keyed = d.select(
        "doc_id", "lang", "head",
        F.struct("lang", "head", "doc_id").alias("_k"),
        F.lit(1).alias("one"),
    )
    ranked = ordered_prefix_sums(keyed, "_k", ["one"]).select(
        "doc_id", "lang", "head",
        (F.col("cum_one_before") + 1).alias("rn"),
    )
    probe = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("head").alias("head_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + _SN_WINDOW)
        ).alias("rn"),
    )
    edges = (
        probe.join(ranked, "rn")
        .where(
            (F.col("lang_a") == F.col("lang"))
            & (F.levenshtein("head_a", "head") <= _SN_EDIT)
        )
        .select(
            F.least("doc_a", "doc_id").alias("id_a"),
            F.greatest("doc_a", "doc_id").alias("id_b"),
        )
    )
    return dedup_clusters(edges)
