"""Round-10 additions: fixed-round iterative model fitting in exact
integers — absorbing-Markov-chain attribution and Fellegi-Sunter EM
record linkage.

Both follow one recipe (pagerank_units' integer regime applied to
model fitting): probabilities live in 1e12 micro-units, every division
is a truncating ``div``/``//`` over non-negative operands, every
intermediate product rides decimal(38,0)/HUGEINT, and the iteration
count is FIXED and stated — so two engines hold bit-identical
parameters after the last round and the full DuckDB value oracle
certifies an ITERATIVE NUMERIC ALGORITHM, not just a relational plan.

`attribution_markov` brings the principled member of the attribution
family (removal effects over an absorbing Markov chain, Anderl et al.
2014) next to the three positional heuristics already in the registry
(`attribution_last_touch` / `attribution_linear` / `attribution_u_shaped`)
— the heuristics weight observed paths, the chain model answers the
counterfactual "what fraction of conversions does channel c CAUSE"
by deleting c and re-solving for absorption probability.

Exactness recipe (pagerank_units applied to absorption solving): the
chain is solved by FIXED-round value iteration in integer micro-units
(1.0 == 1e12) with every division a truncating ``div`` over
non-negative operands — Spark ``div`` and DuckDB ``//`` agree bit for
bit, and integer sums are order-independent, so the whole query is
full-oracle-safe despite being an iterative numeric algorithm. The
iteration converges monotonically from below; after ``_MARKOV_ROUNDS``
both engines hold the IDENTICAL partial sum, so the bounded-round
contract (like graph_weighted_sssp's) is stated, not hidden.

No reference equivalent (the reference's marts stop at positional
attribution-style rollups); cites for the family shape:
``models/marts/`` rollups, SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_repo_spark.queries import q, t

_MARKOV_UNITS = 10**12
_MARKOV_ROUNDS = 16
_FS_UNITS = 10**12
_FS_ROUNDS = 10
# touchpoint channels (fixture-stable event vocabulary, like the 'red %'
# part predicate elsewhere); 'purchase' is the conversion absorber
_MARKOV_CHANNELS = ("click", "error", "signup", "view")


def _markov_oracle() -> str:
    U = _MARKOV_UNITS
    vals = ", ".join(f"('{c}')" for c in ("__base__",) + _MARKOV_CHANNELS)
    rounds = []
    for k in range(1, _MARKOV_ROUNDS + 1):
        p = f"r{k - 1}" if k > 1 else "p0"
        rounds.append(f"""
    r{k} AS MATERIALIZED (
      SELECT sv.vn, sv.s, COALESCE(x.p, 0) AS p
      FROM sv LEFT JOIN (
        SELECT t.vn, t.src AS s,
               CAST(SUM(CAST(t.tpu AS HUGEINT) * pa.p) // {U} AS BIGINT) AS p
        FROM tpv t JOIN (SELECT vn, s, p FROM {p}
                         UNION ALL
                         SELECT vn, '__conv__', CAST({U} AS BIGINT) FROM vr) pa
          ON pa.vn = t.vn AND pa.s = t.dst
        GROUP BY 1, 2) x
      ON x.vn = sv.vn AND x.s = sv.s)""")
    return f"""
    WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events),
    fp AS (
      SELECT user_id, ts AS fts, event_id AS fid FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
    kept AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type, fp.fts
      FROM ev e LEFT JOIN fp USING (user_id)
      WHERE fts IS NULL
         OR (e.ts < fts OR (e.ts = fts AND e.event_id <= fid))),
    lagd AS (
      SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id),
                      '__start__') AS src,
             CASE WHEN event_type = 'purchase' THEN '__conv__'
                  ELSE event_type END AS dst
      FROM kept),
    term AS (
      SELECT src, '__null__' AS dst FROM (
        SELECT event_type AS src,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM kept WHERE fts IS NULL) WHERE rn = 1),
    trans AS (SELECT src, dst FROM lagd
              UNION ALL SELECT src, dst FROM term),
    cnt AS (SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS c
            FROM trans GROUP BY 1, 2),
    nn AS (SELECT src, SUM(c) AS n FROM cnt GROUP BY 1),
    tp AS (SELECT src, dst, CAST((c * {U}) // n AS BIGINT) AS tpu
           FROM cnt JOIN nn USING (src) WHERE dst <> '__null__'),
    vr AS (SELECT vn FROM (VALUES {vals}) v(vn)),
    tpv AS (SELECT vn, src, dst, tpu FROM vr, tp
            WHERE vn = '__base__' OR (src <> vn AND dst <> vn)),
    st AS (SELECT DISTINCT src AS s FROM cnt),
    sv AS (SELECT vn, s FROM vr, st WHERE vn = '__base__' OR s <> vn),
    p0 AS (SELECT vn, s, CAST(0 AS BIGINT) AS p FROM sv),
    {",".join(rounds)},
    base AS (SELECT p AS bp FROM r{_MARKOV_ROUNDS}
             WHERE vn = '__base__' AND s = '__start__'),
    eff AS (
      SELECT vn AS channel,
             (SELECT bp FROM base) AS conv_prob_units,
             p AS removed_prob_units,
             (SELECT bp FROM base) - p AS removal_effect_units
      FROM r{_MARKOV_ROUNDS}
      WHERE s = '__start__' AND vn <> '__base__'),
    tot AS (SELECT SUM(removal_effect_units) AS te FROM eff)
    SELECT channel, conv_prob_units, removed_prob_units,
           removal_effect_units,
           CASE WHEN te > 0
                THEN CAST(removal_effect_units AS DOUBLE)
                     / CAST(te AS DOUBLE) END AS attribution_share
    FROM eff CROSS JOIN tot
    """


@q("attribution_markov", _markov_oracle())
def attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014): model
    each user's journey START → touches → {CONV | NULL} as an absorbing
    Markov chain (conversion = first purchase; journeys truncate there;
    non-converters absorb to NULL after their last touch), then for
    every channel c re-solve the chain with c DELETED (its inbound mass
    redirected to NULL, denominators unrenormalized — the standard
    removal semantics) and report the drop in absorption probability.
    The share of total drop is the channel's attribution — the
    counterfactual answer the positional heuristics approximate.

    Exactness: transition probabilities and absorption values live in
    integer micro-units (1e12); the solve is _MARKOV_ROUNDS rounds of
    truncating value iteration p(s) ← Σ_t tp(s,t)·p(t) div U —
    monotonically increasing, identical partial sums on both engines
    (every div is non-negative, decimal(38,0)/HUGEINT carry the 1e24
    products). The single float op is the final share division on
    identical operands. Bounded-round contract stated like
    graph_weighted_sssp's.

    Scale (100 TB): the fact-sized work is ONE user-key shuffle reused
    by the first-purchase aggregate, the truncation join, and the lag
    window; everything after runs on the |channels|²-bounded transition
    relation (≤36 rows) — 16 round join-aggs over ≤(5·6)-row relations,
    fully lazy (no in-loop action; the relations are literally smaller
    than their task-launch overhead, the same regime as the PCA
    squaring chain).
    """
    U = _MARKOV_UNITS
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    key = F.struct(F.col("ts").alias("a"), F.col("event_id").alias("b"))
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(key).alias("fp"))
    )
    kept = ev.join(fp, "user_id", "left").filter(
        F.col("fp").isNull() | (key <= F.col("fp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagd = kept.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("__start__")).alias(
            "src"
        ),
        F.when(F.col("event_type") == "purchase", "__conv__")
        .otherwise(F.col("event_type"))
        .alias("dst"),
    )
    term = (
        kept.filter(F.col("fp").isNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ts").alias("a"),
                    F.col("event_id").alias("b"),
                    F.col("event_type").alias("t"),
                )
            ).alias("m")
        )
        .select(F.col("m.t").alias("src"), F.lit("__null__").alias("dst"))
    )
    # The transition-count relation is |states|²-bounded (states = the 4
    # channels + __start__; dst adds __conv__/__null__ — ≤36 rows by
    # construction, NEVER data-sized). r12 (guide §1.2 step 1): the 16
    # truncating value-iteration rounds used to run as ~80 unrolled
    # join+agg operators over these ≤36-row relations — the plan (and
    # its optimization time), not the data, was the cost. The rounds now
    # run on the driver over the collected counts with the IDENTICAL
    # integer recurrence (Python // == div on non-negative ints; sums
    # are exact bignums, strictly more headroom than decimal(38,0)), so
    # every emitted unit value is bit-identical — oracle-checked. The
    # fact-sized work (first-purchase agg, truncation join, lag window,
    # transition count) stays distributed and is untouched.
    # r13 (ADVICE): the ≤36-row bound holds because src/dst come from the
    # event_type taxonomy — a feed with a data-sized event_type domain
    # would silently turn this collect (and the O(rounds·|trans|·|ch|)
    # driver loop) into data-sized work. Assert the bound explicitly:
    # take(cap+1) costs the same aggregate and fails loudly instead.
    _state_cap = 10_000
    rows = (
        lagd.unionByName(term)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
        .take(_state_cap + 1)
    )
    if len(rows) > _state_cap:
        raise RuntimeError(
            "attribution_markov: transition relation exceeds "
            f"{_state_cap} rows — the event_type domain is data-sized, "
            "not a channel taxonomy; the driver-side solve contract "
            "(states²-bounded) does not hold for this feed"
        )
    n_by_src: dict[str, int] = {}
    for r in rows:
        n_by_src[r.src] = n_by_src.get(r.src, 0) + r.c
    tp = {
        (r.src, r.dst): (r.c * U) // n_by_src[r.src]
        for r in rows
        if r.dst != "__null__"
    }
    states = {r.src for r in rows}
    pvals: dict[str, int] = {}
    for vn in ("__base__",) + _MARKOV_CHANNELS:
        sts = [s for s in states if vn == "__base__" or s != vn]
        trans = [
            (s, d, u)
            for (s, d), u in tp.items()
            if vn == "__base__" or (s != vn and d != vn)
        ]
        p = {s: 0 for s in sts}
        for _ in range(_MARKOV_ROUNDS):
            pa = dict(p)
            pa["__conv__"] = U
            acc: dict[str, int] = {}
            for s, d, u in trans:
                if d in pa:
                    acc[s] = acc.get(s, 0) + u * pa[d]
            p = {s: acc.get(s, 0) // U for s in sts}
        pvals[vn] = p.get("__start__", 0)
    schema = (
        "channel string, conv_prob_units long, removed_prob_units long,"
        " removal_effect_units long, attribution_share double"
    )
    if "__start__" not in states:  # no journeys at all: mirror the old
        return spark.createDataFrame([], schema)  # empty-relation output
    base_p = pvals["__base__"]
    effects = [(c, base_p - pvals[c]) for c in _MARKOV_CHANNELS]
    te = sum(e for _, e in effects)
    data = [
        (
            c,
            base_p,
            pvals[c],
            e,
            # the single float op, on identical operands: BIGINT→double
            # casts then one IEEE division — same bits in all engines
            (float(e) / float(te)) if te > 0 else None,
        )
        for c, e in effects
    ]
    return spark.createDataFrame(data, schema)


def _fs_prod(engine: str, kind: str) -> str:
    """Truncating micro-unit product Π_i (γ_i ? k_i : U−k_i) over the
    three comparison fields — IDENTICAL chain shape on both engines
    (left-assoc, one truncating division per step) so the integers
    cannot diverge. kind is 'm' or 'u'."""
    U = _FS_UNITS
    big = "HUGEINT" if engine == "duck" else "DECIMAL(38,0)"
    dv = "//" if engine == "duck" else "div"
    t1 = f"(CASE WHEN g1 = 1 THEN {kind}1 ELSE {U} - {kind}1 END)"
    t2 = f"(CASE WHEN g2 = 1 THEN {kind}2 ELSE {U} - {kind}2 END)"
    t3 = f"(CASE WHEN g3 = 1 THEN {kind}3 ELSE {U} - {kind}3 END)"
    return (
        f"((CAST((CAST({t1} AS {big}) * {t2}) {dv} {U} AS {big})"
        f" * {t3}) {dv} {U})"
    )


def _fs_estep_cols(engine: str) -> list[str]:
    """num_m / num_u: prior-weighted pattern likelihoods in units."""
    U = _FS_UNITS
    big = "HUGEINT" if engine == "duck" else "DECIMAL(38,0)"
    dv = "//" if engine == "duck" else "div"
    return [
        f"CAST((CAST(p AS {big}) * {_fs_prod(engine, 'm')}) {dv} {U}"
        f" AS BIGINT) AS num_m",
        f"CAST((CAST({U} - p AS {big}) * {_fs_prod(engine, 'u')}) {dv} {U}"
        f" AS BIGINT) AS num_u",
    ]


def _fs_estep(engine: str) -> str:
    return ", ".join(_fs_estep_cols(engine))


def _fs_mstep_cols(engine: str) -> list[str]:
    """One EM re-estimation: m_i, u_i, p from pattern weights."""
    U = _FS_UNITS
    big = "HUGEINT" if engine == "duck" else "DECIMAL(38,0)"
    dv = "//" if engine == "duck" else "div"
    # the ratio of two U-scaled sums needs the numerator re-scaled by U
    # (both sums carry the same 1e12 factor, so the bare integer ratio
    # would truncate to 0/1); numerator*U peaks at N·U² ≈ 1e36 — inside
    # both HUGEINT (1.7e38) and decimal(38,0)
    cols = []
    for i in (1, 2, 3):
        cols.append(
            f"CAST((SUM(CAST(n AS {big}) * w * g{i}) * {U})"
            f" {dv} GREATEST(SUM(CAST(n AS {big}) * w), 1) AS BIGINT) AS m{i}"
        )
    for i in (1, 2, 3):
        cols.append(
            f"CAST((SUM(CAST(n AS {big}) * ({U} - w) * g{i}) * {U})"
            f" {dv} GREATEST(SUM(CAST(n AS {big}) * ({U} - w)), 1)"
            f" AS BIGINT) AS u{i}"
        )
    cols.append(
        f"CAST(SUM(CAST(n AS {big}) * w)"
        f" {dv} SUM(CAST(n AS {big})) AS BIGINT) AS p"
    )
    return cols


def _fs_mstep(engine: str) -> str:
    return ", ".join(_fs_mstep_cols(engine))


def _fs_w(engine: str) -> str:
    U = _FS_UNITS
    big = "HUGEINT" if engine == "duck" else "DECIMAL(38,0)"
    dv = "//" if engine == "duck" else "div"
    return (
        f"CASE WHEN num_m + num_u = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST((CAST(num_m AS {big}) * {U}) {dv} (num_m + num_u)"
        f" AS BIGINT) END AS w"
    )


def _fs_oracle() -> str:
    U = _FS_UNITS
    rounds = []
    for k in range(1, _FS_ROUNDS + 1):
        s = f"s{k - 1}" if k > 1 else "s0"
        rounds.append(f"""
    e{k} AS (SELECT c.g1, c.g2, c.g3, c.n, {_fs_estep('duck')}
             FROM cnt c CROSS JOIN {s}),
    w{k} AS (SELECT g1, g2, g3, n, {_fs_w('duck')} FROM e{k}),
    s{k} AS (SELECT {_fs_mstep('duck')} FROM w{k})""")
    return f"""
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
             string_split(text, ' ') AS toks
      FROM documents),
    b AS (
      SELECT doc_id, lang, source,
             toks[1] AS b1, n_chars // 100 AS b2,
             array_to_string(list_slice(toks, 1, 3), ' ') AS pfx
      FROM d),
    pr AS (
      SELECT CASE WHEN a.lang = x.lang THEN 1 ELSE 0 END AS g1,
             CASE WHEN a.source = x.source THEN 1 ELSE 0 END AS g2,
             CASE WHEN a.pfx = x.pfx THEN 1 ELSE 0 END AS g3
      FROM b a JOIN b x
        ON a.b1 = x.b1 AND a.b2 = x.b2 AND a.doc_id < x.doc_id),
    cnt AS (SELECT g1, g2, g3, CAST(COUNT(*) AS BIGINT) AS n
            FROM pr GROUP BY 1, 2, 3),
    s0 AS (SELECT CAST({9 * U // 10} AS BIGINT) AS m1,
                  CAST({9 * U // 10} AS BIGINT) AS m2,
                  CAST({9 * U // 10} AS BIGINT) AS m3,
                  CAST({U // 10} AS BIGINT) AS u1,
                  CAST({U // 10} AS BIGINT) AS u2,
                  CAST({U // 10} AS BIGINT) AS u3,
                  CAST({U // 10} AS BIGINT) AS p),
    {",".join(rounds)},
    fin AS (SELECT c.g1, c.g2, c.g3, c.n, {_fs_estep('duck')}
            FROM cnt c CROSS JOIN s{_FS_ROUNDS})
    SELECT CAST(g1 AS INTEGER) AS g_lang,
           CAST(g2 AS INTEGER) AS g_source,
           CAST(g3 AS INTEGER) AS g_prefix,
           n AS n_pairs,
           CASE WHEN num_m + num_u = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((CAST(num_m AS HUGEINT) * {U})
                          // (num_m + num_u) AS BIGINT) END
             AS posterior_units,
           num_m > num_u AS is_match
    FROM fin
    """


@q("record_linkage_fs", _fs_oracle())
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage with UNSUPERVISED EM — the
    probabilistic upgrade of entity_resolution_docs' deterministic
    blocking+comparison: from blocked candidate pairs and three binary
    comparisons (same lang / same source / same 3-token prefix), EM
    learns per-field match (m) and non-match (u) agreement rates plus
    the match prior, then classifies each comparison PATTERN by its
    posterior — no labels, no hand-tuned thresholds (Fellegi & Sunter
    1969; the Splink-style workhorse of production record linkage).

    Exactness: the whole EM runs in truncating integer micro-units
    (1e12) — likelihood products are left-associated truncating ``div``
    chains (decimal(38,0)/HUGEINT carry the 1e24 intermediates), the
    E-step posterior is one guarded division, and the M-step
    re-estimates are ratio divs of pattern-weighted counts; both
    engines execute the IDENTICAL chain (the expression text is
    generated from one builder per step), so after the fixed
    ``_FS_ROUNDS`` both hold bit-identical parameters. is_match is the
    division-free comparison num_m > num_u (posterior > 1/2).

    Scale (100 TB): the fact-sized work is the blocked self-join
    ((first token, length-bucket) keys — Σ block² bounded like
    entity_resolution_docs) and ONE hash-agg down to ≤2³ pattern rows;
    the EM itself is 10 unrolled rounds over an 8-row relation crossed
    with a 1-row state — lazy end to end, no in-loop action.
    """
    U = _FS_UNITS
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.split("text", " ").alias("toks"),
        F.expr("n_chars div 100").alias("b2"),
    )
    b = d.select(
        "doc_id",
        "lang",
        "source",
        F.element_at("toks", 1).alias("b1"),
        "b2",
        F.array_join(F.slice("toks", 1, 3), " ").alias("pfx"),
    )
    a, x = b.alias("a"), b.alias("x")
    pr = a.join(
        x,
        (F.col("a.b1") == F.col("x.b1"))
        & (F.col("a.b2") == F.col("x.b2"))
        & (F.col("a.doc_id") < F.col("x.doc_id")),
    ).select(
        F.when(F.col("a.lang") == F.col("x.lang"), 1).otherwise(0).alias("g1"),
        F.when(F.col("a.source") == F.col("x.source"), 1)
        .otherwise(0)
        .alias("g2"),
        F.when(F.col("a.pfx") == F.col("x.pfx"), 1).otherwise(0).alias("g3"),
    )
    cnt = (
        pr.groupBy("g1", "g2", "g3")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    state = spark.range(1).select(
        *[F.lit(9 * U // 10).cast("long").alias(f"m{i}") for i in (1, 2, 3)],
        *[F.lit(U // 10).cast("long").alias(f"u{i}") for i in (1, 2, 3)],
        F.lit(U // 10).cast("long").alias("p"),
    )
    for _ in range(_FS_ROUNDS):
        e = cnt.crossJoin(F.broadcast(state)).selectExpr(
            "g1", "g2", "g3", "n", *_fs_estep_cols("spark")
        )
        w = e.selectExpr("g1", "g2", "g3", "n", _fs_w("spark"))
        state = w.selectExpr(*_fs_mstep_cols("spark"))
    fin = cnt.crossJoin(F.broadcast(state)).selectExpr(
        "g1", "g2", "g3", "n", *_fs_estep_cols("spark")
    )
    return fin.selectExpr(
        "CAST(g1 AS INT) AS g_lang",
        "CAST(g2 AS INT) AS g_source",
        "CAST(g3 AS INT) AS g_prefix",
        "n AS n_pairs",
        f"CASE WHEN num_m + num_u = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST((CAST(num_m AS DECIMAL(38,0)) * {U})"
        f" div (num_m + num_u) AS BIGINT) END AS posterior_units",
        "num_m > num_u AS is_match",
    )


_SHAPLEY_WINDOW = 8  # conversion = purchase within the first 8 events


def _shapley_oracle() -> str:
    U = _MARKOV_UNITS
    bits = ", ".join(
        f"('{c}', {1 << i})" for i, c in enumerate(_MARKOV_CHANNELS)
    )
    return f"""
    WITH w AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    w8 AS (SELECT * FROM w WHERE rn <= {_SHAPLEY_WINDOW}),
    fp AS (SELECT user_id, MIN(rn) AS prn FROM w8
           WHERE event_type = 'purchase' GROUP BY 1),
    ch(name, bit) AS (SELECT * FROM (VALUES {bits})),
    um AS (
      SELECT w8.user_id,
             COALESCE(bit_or(ch.bit), 0) AS mask,
             CAST(MAX(CASE WHEN prn IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM w8 LEFT JOIN fp USING (user_id)
      LEFT JOIN ch ON ch.name = w8.event_type
      WHERE prn IS NULL OR w8.rn <= prn
      GROUP BY w8.user_id),
    ma AS (SELECT mask, CAST(COUNT(*) AS HUGEINT) AS n_users,
                  CAST(SUM(conv) AS HUGEINT) AS n_conv
           FROM um GROUP BY 1),
    co AS (SELECT CAST(range AS BIGINT) AS s FROM range(16)),
    cv AS (
      SELECT co.s,
             CASE WHEN co.s = 0 OR SUM(ma.n_users) IS NULL
                       OR SUM(ma.n_users) = 0
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST((SUM(ma.n_conv) * {U}) // SUM(ma.n_users)
                            AS BIGINT) END AS v
      FROM co LEFT JOIN ma ON (ma.mask & co.s) = ma.mask
      GROUP BY co.s),
    phi AS (
      SELECT ch.name AS channel,
             CAST(SUM(CASE bit_count(cv.s)
                        WHEN 0 THEN 6 WHEN 1 THEN 2
                        WHEN 2 THEN 2 ELSE 6 END
                      * (cw.v - cv.v)) AS BIGINT) AS shapley_x24_units
      FROM ch
      JOIN cv ON (cv.s & ch.bit) = 0
      JOIN cv cw ON cw.s = (cv.s | ch.bit)
      GROUP BY ch.name),
    ends AS (SELECT (SELECT v FROM cv WHERE s = 15) AS v_full),
    tot AS (SELECT SUM(shapley_x24_units) AS te FROM phi)
    SELECT channel, v_full AS v_full_units,
           shapley_x24_units,
           CASE WHEN te > 0
                THEN CAST(shapley_x24_units AS DOUBLE)
                     / CAST(te AS DOUBLE) END AS attribution_share
    FROM phi CROSS JOIN ends CROSS JOIN tot
    """


@q("attribution_shapley", _shapley_oracle())
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the 4-channel touch lattice
    — the coalition-game complement of attribution_markov (the chain
    model asks "what breaks if I delete c"; Shapley asks "what is c's
    fair share of the lift over never-touched users", with the axioms —
    efficiency, symmetry, dummy — holding EXACTLY because 4 channels
    make the 2⁴ coalition sum closed-form, no sampling).

    Characteristic function: v(S) = rate of conversion WITHIN THE FIRST
    ``_SHAPLEY_WINDOW`` events among users whose pre-conversion touch
    set ⊆ S, in truncating micro-units, with v(∅) ANCHORED AT 0 (the
    marketing-Shapley convention: purchase-with-no-prior-touch is a
    direct conversion, not attributable lift — and on this fixture
    lifetime conversion is ~universal, so the bounded window is what
    gives the characteristic function its variance). Shapley values are
    emitted ×24 (= 4! — the weights 6/2/2/6 are |S|!·(3−|S|)!), so the
    output is DIVISION-FREE exact integers: signs survive, and
    Σ_c φ·24 ≡ 24·v(full) — the efficiency axiom over the anchored v —
    holds bit-exactly for ANY v, which the unit test pins. The one
    float op is the share division on identical operands.

    Scale (100 TB): fact work is one user-key shuffle reused by the
    rank window and the (mask, conv) reduce — bit_or of channel bits,
    map-side combinable; everything after runs on 16-row coalition
    relations (subset sums via the mask & S = mask join, 16×16 worst
    case). No iteration.
    """
    U = _MARKOV_UNITS
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w8 = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SHAPLEY_WINDOW)
        .select("user_id", "event_type", "rn")
    )
    fp = (
        w8.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    bit = F.lit(None).cast("long")
    for i, c in enumerate(_MARKOV_CHANNELS):
        bit = F.when(F.col("event_type") == c, F.lit(1 << i)).otherwise(bit)
    um = (
        w8.join(fp, "user_id", "left")
        .filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .groupBy("user_id")
        .agg(
            F.coalesce(F.bit_or(bit), F.lit(0)).alias("mask"),
            F.max(
                F.when(F.col("prn").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("conv"),
        )
    )
    ma = (
        um.groupBy("mask")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("conv").cast("long").alias("n_conv"),
        )
        .localCheckpoint(eager=True)
    )
    co = spark.range(16).select(F.col("id").alias("s"))
    cv = (
        co.join(
            F.broadcast(ma),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(
            F.expr(
                f"CASE WHEN s = 0 OR SUM(n_users) IS NULL"
                f" OR SUM(n_users) = 0"
                f" THEN CAST(0 AS BIGINT)"
                f" ELSE CAST((SUM(CAST(n_conv AS DECIMAL(38,0))) * {U})"
                f" div SUM(CAST(n_users AS DECIMAL(38,0))) AS BIGINT)"
                f" END"
            ).alias("v")
        )
        .localCheckpoint(eager=True)
    )
    ch = spark.createDataFrame(
        [(c, 1 << i) for i, c in enumerate(_MARKOV_CHANNELS)],
        "channel string, bit long",
    )
    cw = cv.select(F.col("s").alias("_ws"), F.col("v").alias("_wv"))
    phi = (
        ch.crossJoin(F.broadcast(cv))
        .filter(F.col("s").bitwiseAND(F.col("bit")) == 0)
        .join(
            F.broadcast(cw),
            F.col("_ws") == F.col("s").bitwiseOR(F.col("bit")),
        )
        .groupBy("channel")
        .agg(
            F.sum(
                F.expr(
                    "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2"
                    " WHEN 2 THEN 2 ELSE 6 END"
                )
                * (F.col("_wv") - F.col("v"))
            )
            .cast("long")
            .alias("shapley_x24_units")
        )
    )
    ends = cv.filter(F.col("s") == 15).select(
        F.col("v").alias("v_full_units")
    )
    tot = phi.agg(F.sum("shapley_x24_units").alias("te"))
    return (
        phi.crossJoin(F.broadcast(ends))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "v_full_units",
            "shapley_x24_units",
            F.when(
                F.col("te") > 0,
                F.col("shapley_x24_units").cast("double")
                / F.col("te").cast("double"),
            ).alias("attribution_share"),
        )
    )


@q(
    "eval_conformal_mondrian",
    """
    WITH base AS (
      SELECT o_orderpriority AS priority,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             instr('0123456789abcdef',
                   substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS nib
      FROM orders),
    tr AS (
      SELECT priority,
             CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred,
             CAST(COUNT(*) AS BIGINT) AS n_train
      FROM base WHERE nib < 8 GROUP BY 1),
    cal AS (
      SELECT b.priority, ABS(b.cents - tr.pred) AS err
      FROM base b JOIN tr USING (priority)
      WHERE nib >= 8 AND nib < 12),
    sc AS (SELECT priority, err, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM cal GROUP BY 1, 2),
    ng AS (
      SELECT priority, CAST(SUM(cnt) AS BIGINT) AS n_cal,
             CAST(((SUM(cnt) + 1) * 9 + 9) // 10 AS BIGINT) AS k_cal
      FROM sc GROUP BY 1),
    cum AS (
      SELECT priority, err,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY err
                            ROWS UNBOUNDED PRECEDING) AS c
      FROM sc),
    qh AS (
      SELECT cum.priority,
             CAST(MIN(CASE WHEN c >= ng.k_cal THEN err END) AS BIGINT)
               AS q_hat_cents
      FROM cum JOIN ng USING (priority) GROUP BY 1),
    te AS (
      SELECT b.priority, ABS(b.cents - tr.pred) AS err
      FROM base b JOIN tr USING (priority) WHERE nib >= 12),
    cov AS (
      SELECT te.priority, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN qh.q_hat_cents IS NULL
                            OR te.err <= qh.q_hat_cents
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM te JOIN qh USING (priority) GROUP BY 1)
    SELECT tr.priority, tr.n_train, ng.n_cal, ng.k_cal, qh.q_hat_cents,
           cov.n_test, cov.n_covered,
           CAST(cov.n_covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
             AS coverage
    FROM tr JOIN ng USING (priority) JOIN qh USING (priority)
    JOIN cov USING (priority)
    """,
)
def eval_conformal_mondrian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian (group-conditional) SPLIT-CONFORMAL calibration — the
    modern distribution-free uncertainty layer the eval family lacked:
    per priority group, learn a point predictor on the train split
    (integer mean of order cents), take the ⌈(n_cal+1)·0.9⌉-th smallest
    absolute calibration residual as the conformal radius q̂ (exact
    finite-sample ≥90% coverage guarantee per group — Vovk et al.;
    Mondrian = per-group calibration, so heteroscedastic groups get
    their own radii), then AUDIT the guarantee on the held-out test
    split. Splits are content-addressed md5 nibbles (8/4/4 of 16 —
    hash_split's idiom), so membership is reproducible and incremental
    corpus growth never leaks test rows.

    Exactness: everything through q̂ is exact integers (cents,
    truncating integer mean, ceil via (a+9) div 10, order statistic by
    per-group cumulative counts over the DISTINCT-residual relation);
    the only float op is the final coverage division on identical
    operands. k > n_cal (infinite interval) yields q̂ NULL and counts
    every test row covered — stated identically in both engines.

    Scale (100 TB): the per-group order statistic does NOT use a
    per-group window over raw rows — residuals collapse to the
    (group, err)-distinct relation (map-side combinable hash-agg), the
    per-group cumulative rides ordered_prefix_sums on the struct key
    (priority, err) (global two-phase range shuffle, no single-task
    window) with the group-start offset subtracted back, and q̂ is a
    MIN-filter over that relation. Train/test passes are hash-agg +
    broadcast-join shapes.
    """
    from dbt_repo_spark.operators.evalmetrics import ordered_prefix_sums
    from dbt_repo_spark.queries import dec

    od = t(spark, sf_dir, "orders")
    base = od.select(
        F.col("o_orderpriority").alias("priority"),
        (dec("o_totalprice", 14, 2) * 100).cast("long").alias("cents"),
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
        ).alias("nib"),
    )
    tr = (
        base.filter(F.col("nib") < 8)
        .groupBy("priority")
        .agg(
            F.expr(
                "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) div COUNT(*)"
                " AS BIGINT)"
            ).alias("pred"),
            F.count("*").cast("long").alias("n_train"),
        )
    )
    cal = (
        base.filter((F.col("nib") >= 8) & (F.col("nib") < 12))
        .join(F.broadcast(tr), "priority")
        .select(
            "priority", F.abs(F.col("cents") - F.col("pred")).alias("err")
        )
    )
    sc = cal.groupBy("priority", "err").agg(
        F.count("*").cast("long").alias("cnt")
    )
    ng = sc.groupBy("priority").agg(
        F.sum("cnt").cast("long").alias("n_cal"),
        F.expr("CAST(((SUM(cnt) + 1) * 9 + 9) div 10 AS BIGINT)").alias(
            "k_cal"
        ),
    )
    keyed = sc.select(
        "priority",
        "err",
        "cnt",
        F.struct(
            F.col("priority").alias("a"), F.col("err").alias("b")
        ).alias("_okey"),
    )
    cum = ordered_prefix_sums(keyed, "_okey", ["cnt"])
    gs = cum.groupBy("priority").agg(
        F.min("cum_cnt_before").alias("_gs")
    )
    cum2 = cum.join(gs, "priority").select(
        "priority",
        "err",
        (F.col("cum_cnt_before") + F.col("cnt") - F.col("_gs")).alias("c"),
    )
    qh = (
        cum2.join(F.broadcast(ng), "priority")
        .groupBy("priority")
        .agg(
            F.min(F.when(F.col("c") >= F.col("k_cal"), F.col("err")))
            .cast("long")
            .alias("q_hat_cents")
        )
    )
    te = (
        base.filter(F.col("nib") >= 12)
        .join(F.broadcast(tr), "priority")
        .select(
            "priority", F.abs(F.col("cents") - F.col("pred")).alias("err")
        )
    )
    cov = (
        te.join(F.broadcast(qh), "priority")
        .groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.col("q_hat_cents").isNull()
                    | (F.col("err") <= F.col("q_hat_cents")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        tr.join(ng, "priority")
        .join(qh, "priority")
        .join(cov, "priority")
        .select(
            "priority",
            "n_train",
            "n_cal",
            "k_cal",
            "q_hat_cents",
            "n_test",
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# Welch z and erfc p-value as ONE expression text shared verbatim by both
# engines (columns n1,s1,ss1,n2,s2,ss2 pre-aggregated): every op after the
# initial casts is IEEE-double on identical operands (divisions, Horner
# polynomial, sqrt are correctly rounded everywhere), so z is bit-identical
# cross-engine; exp() is the single non-correctly-rounded op, absorbed by
# the 6-dp p rounding (the repo's ln convention, queries_eval.py:825).
# pooled Welch variance term (the sqrt argument) is its own shared text so
# the z-stage filter can exclude zero-variance groups — a group whose own
# AND complement values are all constant has no valid Welch test (z would
# be 0/0 = NaN, which non-ANSI Spark silently casts to 0 while DuckDB
# raises); such groups are dropped from testing and from m, identically on
# both engines
_BH_VARSUM = (
    "(((CAST(ss1 AS DOUBLE)/CAST(n1 AS DOUBLE))"
    " - (CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE))"
    "*(CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)))"
    " * (CAST(n1 AS DOUBLE)/CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE))"
    " + (((CAST(ss2 AS DOUBLE)/CAST(n2 AS DOUBLE))"
    " - (CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE))"
    "*(CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)))"
    " * (CAST(n2 AS DOUBLE)/CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE))"
)
_BH_Z = (
    "((CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE))"
    " - (CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)))"
    f" / sqrt({_BH_VARSUM})"
)
# two-sided p = erfc(|z|/sqrt(2)), Abramowitz-Stegun 7.1.26 (|err|<=1.5e-7,
# identical on both engines since the formula text is identical); column x
# is |z|/sqrt(2), column t is 1/(1+0.3275911*x)
_BH_P = (
    "(t*(0.254829592 + t*(-0.284496736 + t*(1.421413741"
    " + t*(-1.453152027 + t*1.061405429))))) * exp(-(x*x))"
)
_BH_ALPHA_MICROS = 50_000  # alpha = 0.05 in p-micros


@q(
    "eval_bh_fdr",
    f"""
    WITH base AS (
      SELECT n_name,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    g AS (
      SELECT n_name, CAST(COUNT(*) AS HUGEINT) AS n1,
             CAST(SUM(cents) AS HUGEINT) AS s1,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss1
      FROM base GROUP BY 1),
    tot AS (SELECT SUM(n1) AS nt, SUM(s1) AS st, SUM(ss1) AS sst FROM g),
    sides AS (
      SELECT n_name, n1, s1, ss1,
             nt - n1 AS n2, st - s1 AS s2, sst - ss1 AS ss2
      FROM g CROSS JOIN tot),
    z AS (SELECT n_name, CAST(n1 AS BIGINT) AS n_obs, {_BH_Z} AS z
          FROM sides
          WHERE n1 >= 2 AND n2 >= 2 AND ({_BH_VARSUM}) > 0),
    xt AS (SELECT n_name, n_obs, z,
                  abs(z)/sqrt(2.0) AS x FROM z),
    tt AS (SELECT n_name, n_obs, z, x,
                  1.0/(1.0 + 0.3275911*x) AS t FROM xt),
    pv AS (SELECT n_name, n_obs, z,
                  CAST(round(({_BH_P}) * 1000000, 0) AS BIGINT)
                    AS p_micros
           FROM tt),
    rk AS (SELECT n_name, n_obs, z, p_micros,
                  CAST(count(*) OVER () AS BIGINT) AS m,
                  CAST(row_number() OVER (ORDER BY p_micros, n_name)
                       AS BIGINT) AS rank
           FROM pv),
    km AS (SELECT COALESCE(MAX(CASE WHEN p_micros * m
                                         <= rank * {_BH_ALPHA_MICROS}
                                    THEN rank END), 0) AS k_max
           FROM rk)
    SELECT n_name, n_obs, z, p_micros, rank,
           rank <= k_max AS bh_reject, k_max
    FROM rk CROSS JOIN km
    """,
)
def eval_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-nation order-value
    z-tests — the multiple-testing correction the eval family lacked
    (25 simultaneous hypotheses at α=0.05: without step-up control,
    ~1.25 false discoveries are EXPECTED under the global null; BH
    bounds the false-discovery RATE instead). Per nation: Welch z of
    that nation's customers' order cents vs all other nations (exact
    integer sums; rest side = global − nation, exact); two-sided p =
    erfc(|z|/√2) via the Abramowitz-Stegun 7.1.26 polynomial; then the
    BH step-up: rank p ascending, k_max = max{{k : p_(k) ≤ k·α/m}},
    reject ranks ≤ k_max.

    Exactness: z is bit-identical cross-engine (every op after the
    integer-sum casts is a correctly-rounded IEEE double op on
    identical operands — the z/p expression TEXT is shared verbatim by
    both engines); exp() is the one non-correctly-rounded op and is
    absorbed by the 6-dp p rounding (the repo's ln convention). The BH
    threshold comparison is exact integers (p_micros·m ≤ rank·50000 —
    no α division), and ties order by (p_micros, n_name), a total
    order.

    Scale (100 TB): one fact scan → per-nation integer sums (map-side
    combinable; customer/nation broadcast), then all testing math on
    the |nations|-row relation; the rank window orders 25 rows. m is
    data-derived from the FILTERED test relation — the count of tests
    actually run (nations with n ≥ 2 on both sides AND positive pooled
    variance; a both-sides-constant group has no valid Welch test and
    would otherwise yield z = 0/0, which the engines disagree on).
    """
    base = (
        t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    d38 = "decimal(38,0)"
    g = base.groupBy("n_name").agg(
        F.count("*").cast(d38).alias("n1"),
        F.sum(F.col("cents").cast(d38)).alias("s1"),
        F.sum(F.col("cents").cast(d38) * F.col("cents").cast(d38)).alias(
            "ss1"
        ),
    )
    tot = g.agg(
        F.sum("n1").alias("nt"),
        F.sum("s1").alias("st"),
        F.sum("ss1").alias("sst"),
    )
    sides = g.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n1",
        "s1",
        "ss1",
        (F.col("nt") - F.col("n1")).alias("n2"),
        (F.col("st") - F.col("s1")).alias("s2"),
        (F.col("sst") - F.col("ss1")).alias("ss2"),
    )
    z = sides.filter(
        (F.col("n1") >= 2)
        & (F.col("n2") >= 2)
        & (F.expr(_BH_VARSUM) > 0)
    ).selectExpr("n_name", "CAST(n1 AS BIGINT) AS n_obs", f"{_BH_Z} AS z")
    pv = (
        z.selectExpr("n_name", "n_obs", "z", "abs(z)/sqrt(2.0) AS x")
        .selectExpr(
            "n_name", "n_obs", "z", "x",
            "1.0/(1.0 + 0.3275911*x) AS t",
        )
        .selectExpr(
            "n_name", "n_obs", "z",
            f"CAST(round(({_BH_P}) * 1000000, 0) AS BIGINT) AS p_micros",
        )
    )
    w = Window.orderBy("p_micros", "n_name")
    # m = tests actually run: count over the filtered relation (25-ish
    # rows — the single-partition exchange is already paid by row_number)
    wm = Window.partitionBy()
    rk = pv.withColumn(
        "m", F.count(F.lit(1)).over(wm).cast("long")
    ).withColumn("rank", F.row_number().over(w).cast("long"))
    km = rk.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_micros") * F.col("m")
                    <= F.col("rank") * F.lit(_BH_ALPHA_MICROS),
                    F.col("rank"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("k_max")
    )
    return rk.crossJoin(F.broadcast(km)).select(
        "n_name",
        "n_obs",
        "z",
        "p_micros",
        "rank",
        (F.col("rank") <= F.col("k_max")).alias("bh_reject"),
        "k_max",
    )
