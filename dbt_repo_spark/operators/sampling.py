"""Sampling / splitting / packing operators for training-data pipelines.

Everything here is DETERMINISTIC — ordering and membership derive from
md5 of stable ids, never from RNG state or partition layout — so results
are reproducible run-to-run, engine-portable (md5 is identical in Spark
and DuckDB, which the oracles exploit), and safe to re-run incrementally
at 100 TB without resampling previously selected rows.

Scale notes:
- ``stratified_sample`` / ``cap_per_key``: one shuffle on the stratum/key
  (window row_number); map-side WindowGroupLimit prunes before the
  exchange when a constant cap applies.
- ``hash_split``: pure projection — scan-speed, no shuffle, and the
  split of a row never changes as the corpus grows (content-addressed).
- ``pack_token_budget``: one shuffle on the pack partition key; packing
  is a running-sum window within each partition, so pack assembly is
  linear and never funnels through the driver.

No counterpart in the reference repo (its pipeline has no sampling layer);
these extend SURVEY.md §2's training-data operator families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(id_col: str) -> Column:
    """Deterministic pseudo-random order key: md5 of the stringified id."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame, strata: list[str], fraction: float, id_col: str
) -> DataFrame:
    """Exact-count stratified sample: ceil(fraction * |stratum|) rows each.

    Rows within a stratum are ranked by md5(id) — a fixed, uniform,
    content-addressed order — and the top ``ceil(fraction * n)`` are kept.
    Unlike ``df.sampleBy`` (Bernoulli per row), per-stratum counts are
    EXACT, and membership is stable across runs and engines.
    """
    w = Window.partitionBy(*strata).orderBy(_hash_order(id_col), F.col(id_col))
    cnt = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(cnt))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


def cap_per_key(
    df: DataFrame, keys: list[str], cap: int, order_by: list[Column]
) -> DataFrame:
    """Cap rows per key at ``cap``, keeping the first by ``order_by``.

    The class-balance primitive: bound any single key's contribution
    (a hot user, a boilerplate-heavy domain) to a training set. Constant
    cap → Spark inserts WindowGroupLimit, pruning to ``cap`` rows per key
    map-side BEFORE the exchange — the shuffle carries O(keys x cap).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic train/val/test split by the first md5 nibble.

    ``splits`` maps split name → number of nibble values (out of 16);
    default 13/2/1 ≈ 81.25% / 12.5% / 6.25%. Content-addressed: a row's
    split never changes as other rows come and go, so incremental corpus
    builds never leak val/test rows into train. Adds a ``split`` column;
    pure projection (no shuffle, no RNG).
    """
    splits = splits or {"train": 13, "val": 2, "test": 1}
    if sum(splits.values()) != 16:
        raise ValueError("split nibble counts must sum to 16")
    nibble = F.conv(F.substring(_hash_order(id_col), 1, 1), 16, 10).cast("int")
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = nibble < F.lit(lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 1024,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing).

    Documents are sharded by ``pmod(md5-prefix(id), num_shards)`` and laid
    out in md5 order within each shard; a running token sum assigns each
    document to pack ``floor(tokens_before / budget)``. A pack may
    overflow ``budget`` by at most one document (the straddling document
    belongs to the pack where it starts) — the price of keeping packing a
    single linear window instead of an iterative bin-packer. Documents
    longer than ``budget`` get a pack of their own plus spillover.

    Emits (shard, pack_id, id, n_tokens, tokens_before) — the writer sorts
    by (shard, pack_id) to lay packs out contiguously. One shuffle on
    ``shard``; shard count bounds window state, so 100 TB packs in
    parallel across ``num_shards`` independent streams.
    """
    shard = F.pmod(
        F.conv(F.substring(_hash_order(id_col), 1, 8), 16, 10).cast("long"),
        F.lit(num_shards),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(_hash_order(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            shard.alias("shard"),
            F.col(id_col),
            F.col(token_col).alias("n_tokens"),
        )
        .withColumn(
            "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn(
            "pack_id", F.floor(F.col("tokens_before") / F.lit(budget))
        )
        .select("shard", "pack_id", id_col, "n_tokens", "tokens_before")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sample without replacement (A-Res, Efraimidis
    & Spirakis): keep the k rows with the largest ``u^(1/w)`` where u is a
    content-addressed uniform in (0,1).

    u derives from the first 8 hex chars of md5(id) — reproducible,
    engine-portable, and independent of partition layout. Selection is a
    single global top-k (TakeOrderedAndProject — map-side partial top-k,
    only k rows per partition cross the shuffle); rows with non-positive
    weight are excluded. Re-running on a grown corpus never reshuffles
    the priorities of existing rows, so incremental re-draws are stable.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + F.lit(1)
    ) / F.lit(float(2**32) + 2)  # open interval: never exactly 0 or 1
    priority = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__pri", priority)
        .orderBy(F.col("__pri").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )


def mixture_sample(
    df: DataFrame, domain_col: str, weights: dict[str, float], id_col: str
) -> DataFrame:
    """Largest feasible sample matching a target domain mixture exactly.

    The domain-rebalancing primitive of training-corpus assembly (the
    DoReMi / SlimPajama "data mixture" step): given target proportions
    ``weights`` (summing to ~1), emit the LARGEST subset whose per-domain
    counts hit floor(w_d * T) rows, where T = floor(min_d n_d / w_d) is
    the total the scarcest domain supports. Selection within a domain is
    by md5(id) rank — content-addressed, so membership is reproducible
    across runs, engines, and partition layouts, and growing one domain
    never perturbs another domain's picks.

    Plan: one per-domain count (partial-agg'd map-side, |domains| rows),
    the T/k_d arithmetic on that tiny relation, broadcast back, and one
    rank-filter per domain. The per-domain row_number funnels each
    domain through one task — fine while |domains| is dozens-to-hundreds
    of web/book/code-scale buckets but a skew bottleneck if a single
    domain is ~the whole corpus; at that scale swap the window for the
    two-phase range-partitioned rank of ``ids.dense_ids`` (same output,
    no single-task stage). Cheaper still, when EXACT counts are not
    required: filter on the hash VALUE (md5 < rate-quantile), which is
    shuffle-free but binomially approximate per domain.
    """
    domains = sorted(weights)
    wmap = F.create_map(
        *[F.lit(x) for d in domains for x in (d, float(weights[d]))]
    )
    counts = (
        df.filter(F.col(domain_col).isin(domains))
        .groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__w", wmap[F.col(domain_col)])
    )
    t_total = counts.agg(
        F.floor(F.min(F.col("__n") / F.col("__w"))).alias("__T")
    )
    quotas = (
        counts.crossJoin(F.broadcast(t_total))
        .select(
            domain_col,
            F.floor(F.col("__w") * F.col("__T")).cast("long").alias("__k"),
        )
    )
    w = Window.partitionBy(domain_col).orderBy(_hash_order(id_col), F.col(id_col))
    return (
        df.filter(F.col(domain_col).isin(domains))
        .join(F.broadcast(quotas), domain_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__k"))
        .drop("__rn", "__k")
    )


def token_budget_mixture(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str,
    token_count_col: str,
    token_budget: int,
) -> DataFrame:
    """Assemble a corpus hitting a target TOKEN mixture under a budget.

    Production LLM mixtures are specified in tokens, not documents (a
    domain of long books and a domain of short posts with equal doc
    counts are nothing alike). Per domain, documents are taken greedily
    in md5(id) order while the running token sum stays within the
    domain's share ``w_d * token_budget``; the document that would cross
    the boundary is excluded, so every run under- rather than over-fills
    and membership is reproducible (content-addressed order, engine-
    portable arithmetic: exact integer token sums).

    Same single-task-per-domain window caveat as ``mixture_sample`` —
    a running sum per domain; swap in a two-phase (per-range partial
    sums + offsets) scan at single-giant-domain scale.
    """
    domains = sorted(weights)
    wmap = F.create_map(
        *[F.lit(x) for d in domains for x in (d, float(weights[d]))]
    )
    w = Window.partitionBy(domain_col).orderBy(
        _hash_order(id_col), F.col(id_col)
    )
    return (
        df.filter(F.col(domain_col).isin(domains))
        .withColumn(
            "__cum", F.sum(token_count_col).over(w)
        )
        .filter(
            F.col("__cum")
            <= wmap[F.col(domain_col)] * F.lit(float(token_budget))
        )
        .drop("__cum")
    )


def curriculum_token_shards(
    docs: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int = 4096,
    id_bits: int = 42,
) -> DataFrame:
    """Curriculum shard manifest: documents ordered short-to-long (the
    standard length-curriculum for LLM pretraining), cut into shards of
    ``budget`` tokens by the EXCLUSIVE running token count, one manifest
    row per shard — the writer's plan for emitting curriculum-ordered
    training shards.

    The global order (tok_col ASC, id_col ASC) is packed into one
    BIGINT key (tok << id_bits | id; callers with ids ≥ 2^id_bits raise
    id_bits — tokens-per-doc caps at 2^(62-id_bits); BOTH bounds are
    asserted in-plan, so a violating row fails the job loudly instead
    of silently wrapping the curriculum order) and the running
    sum runs through evalmetrics.ordered_prefix_sums: range-shuffle +
    per-partition window + broadcast partition offsets — NO
    single-partition global window anywhere (plan-shape-tested), unlike
    the naive ``SUM() OVER (ORDER BY ...)`` which funnels the corpus
    through one task. Shard id = cum_before div budget, so a document
    lands in the shard where it STARTS (oversized docs spill past the
    boundary rather than splitting — writer-friendly).

    All integers end-to-end → order-independent → full-oracle-safe.
    Returns one row per shard: (shard_id, n_docs, shard_tokens,
    min_tokens, max_tokens, min_doc_id, max_doc_id).
    """
    from dbt_repo_spark.operators.evalmetrics import ordered_prefix_sums

    tok_cap = 1 << (62 - id_bits)
    id_cap = 1 << id_bits
    in_contract = (
        (F.col("n_tokens") >= 0)
        & (F.col("n_tokens") < F.lit(tok_cap).cast("long"))
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < F.lit(id_cap).cast("long"))
    )
    # 62-bit packing contract enforced IN the key expression: shiftleft
    # is not ANSI-checked, so n_tokens >= 2^(62-id_bits) (book-length
    # docs!) or doc_id >= 2^id_bits would silently wrap and corrupt the
    # global curriculum order. assert_true is folded into the key (not a
    # droppable side column) so column pruning can never elide it; a
    # violating row fails the job loudly instead of mis-sharding.
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tok_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "_okey",
        F.when(
            F.assert_true(
                in_contract,
                F.lit(
                    "curriculum_token_shards: packed-key contract violated"
                    f" — need 0 <= n_tokens < 2^{62 - id_bits} and"
                    f" 0 <= doc_id < 2^{id_bits} (id_bits={id_bits});"
                    " raise/lower id_bits to fit the data"
                ),
            ).isNull(),
            F.shiftleft(F.col("n_tokens"), id_bits) + F.col("doc_id"),
        ),
    )
    cum = ordered_prefix_sums(keyed, "_okey", ["n_tokens"])
    return (
        cum.withColumn(
            "shard_id", F.expr(f"cum_n_tokens_before div {budget}")
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
