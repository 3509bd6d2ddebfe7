"""range_join (relational), funnel (timeseries), redact_pii (text).

Each operator is checked against a brute-force equivalent on synthetic
rows, plus the plan property that motivates it (range_join must not plan
a nested-loop join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_repo_spark.operators.relational import range_join
from dbt_repo_spark.operators.text import redact_pii
from dbt_repo_spark.operators.timeseries import funnel


def test_range_join_matches_bruteforce(spark):
    points = spark.createDataFrame([(i,) for i in range(0, 200, 3)], ["p"])
    intervals = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 40), (3, 40, 41), (4, 150, 260), (5, 7, 7)],
        ["iv_id", "s", "e"],
    )
    got = {
        (r["iv_id"], r["p"])
        for r in range_join(points, intervals, "p", "s", "e", bucket_width=16).collect()
    }
    want = {
        (r["iv_id"], r["p"])
        for r in points.crossJoin(intervals)
        .filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
        .collect()
    }
    assert got == want
    assert len(got) > 0
    # degenerate interval (e <= s) contributes nothing
    assert not any(iv == 5 for iv, _ in got)


def test_range_join_plans_equi_join(spark):
    points = spark.range(100).select(F.col("id").alias("p"))
    intervals = spark.range(10).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 10).alias("s"),
        (F.col("id") * 10 + 5).alias("e"),
    )
    plan = (
        range_join(points, intervals, "p", "s", "e", bucket_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_funnel_ordering_semantics(spark):
    rows = [
        # u1 completes in order
        (1, 10, "signup"), (1, 20, "view"), (1, 30, "purchase"),
        # u2: purchase BEFORE its post-signup view -> t_3 null
        (2, 10, "signup"), (2, 30, "view"), (2, 20, "purchase"),
        # u3: never signed up -> absent
        (3, 10, "view"), (3, 20, "purchase"),
        # u4: signup only
        (4, 99, "signup"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(ev, "user_id", "ts", "event_type",
                        ["signup", "view", "purchase"]).collect()
    }
    assert got == {1: (10, 20, 30), 2: (10, 30, None), 4: (99, None, None)}


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, ip 10.1.2.3, call +47 9988 7766"),
            (2, "clean text, version 1.2 is not an ip, 1+1 no phone"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (2, 1, 1)
    assert r1["redacted_text"] == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    r2 = out[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
    assert r2["redacted_text"].startswith("clean text")


# --- property-based: random intervals/points vs brute force ---

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 30)), min_size=1, max_size=15),
    st.integers(1, 20),
)
@settings(max_examples=5, deadline=None)
def test_range_join_property(spark, points, ivs, bucket):
    pdf = spark.createDataFrame([(i, p) for i, p in enumerate(points)], ["pid", "p"])
    idf = spark.createDataFrame(
        [(j, s, s + w) for j, (s, w) in enumerate(ivs)], ["iv", "s", "e"]
    )
    got = {
        (r["iv"], r["pid"])
        for r in range_join(pdf, idf, "p", "s", "e", bucket_width=bucket).collect()
    }
    want = {
        (j, i)
        for j, (s, w) in enumerate(ivs)
        for i, p in enumerate(points)
        if s <= p < s + w
    }
    assert got == want


def test_chunk_documents_boundaries(spark):
    from dbt_repo_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "x" * 5), (2, "a" * 10 + "b" * 10 + "c" * 3)], ["doc_id", "text"]
    )
    out = chunk_documents(df, "doc_id", "text", chunk_chars=10, overlap=2)
    got = {(r["id"], r["chunk_id"]): (r["chunk_start"], r["chunk_text"])
           for r in out.collect()}
    # doc 1 shorter than one chunk -> exactly one chunk
    assert got[(1, 0)] == (1, "xxxxx")
    assert len([k for k in got if k[0] == 1]) == 1
    # doc 2: len 23, stride 8 -> ceil((23-2)/8) = 3 chunks at 1, 9, 17
    assert got[(2, 0)] == (1, "a" * 10)
    assert got[(2, 1)] == (9, "aa" + "b" * 8)
    assert got[(2, 2)] == (17, "bbbbccc")
    # consecutive chunks overlap by exactly 2 chars
    assert got[(2, 0)][1][-2:] == got[(2, 1)][1][:2]


def test_bigram_lm_scores_hand_computed(spark):
    from dbt_repo_spark.operators.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs, "doc_id", "text").collect()}
    # corpus: c(a,b)=3 c(b,a)=1 c(b,c)=1; c1(a)=3 c1(b)=2; V=4 (a,b,c,x); k=.5
    import math

    p_ab = -math.log((3 + 0.5) / (3 + 0.5 * 4))
    p_ba = -math.log((1 + 0.5) / (2 + 0.5 * 4))
    p_bc = -math.log((1 + 0.5) / (2 + 0.5 * 4))
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_nll"] - (2 * p_ab + p_ba) / 3) < 1e-6
    assert out[2]["n_bigrams"] == 2
    assert abs(out[2]["avg_nll"] - (p_ab + p_bc) / 2) < 1e-6
    # single-token doc: no bigrams, NULL score
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_nll"] is None


def test_pii_spans_offsets_and_precedence(spark):
    from dbt_repo_spark.operators.text import pii_spans

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co then ip 10.0.0.1 call +12 345 6789 0"),
            (2, "no pii here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = pii_spans(df, "doc_id", "text").collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.span_type, []).append(r)
    assert all(r.span_matches_text for r in out)  # offsets certified
    em = by_type["email"][0]
    assert (em.start, em.end, em.span_text) == (5, 11, "a@b.co")
    ip = by_type["ipv4"][0]
    assert ip.span_text == "10.0.0.1"
    ph = by_type["phone"][0]
    assert ph.span_text.startswith("+12")
    assert not [r for r in out if r.doc_id == 2]  # clean doc, no rows


def test_pii_spans_agree_with_redaction(spark, sf_dir):
    """Every span the extractor reports is text redact_pii replaces:
    masking the reported spans yields a string with the same PII counts
    as the redactor's own output."""
    from dbt_repo_spark.operators.text import pii_spans, redact_pii

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(200)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" mail u@example.com ip 10.0.0.7 tel +47 2255 0101"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    spans = pii_spans(docs, "doc_id", "text")
    assert spans.filter(~F.col("span_matches_text")).count() == 0
    n_spans = spans.count()
    red = redact_pii(docs, "doc_id", "text")
    total_redacted = red.agg(
        F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
    ).collect()[0][0]
    assert n_spans == total_redacted


def test_pii_spans_registry_certificates_all_true(spark, sf_dir):
    """The r8-hardened registry entry carries three certificates per
    span row (Python slice match, an independent JVM substring re-check
    of the offsets, and per-class count agreement with redact_pii's JVM
    regexp_count) — every one must hold on the seeded corpus, and the
    relation must be non-vacuous (the %3 seeding guarantees spans)."""
    from dbt_repo_spark.queries import QUERIES

    rows = QUERIES["text_pii_spans"](spark, sf_dir).collect()
    assert rows, "seeded corpus must produce spans"
    assert {r.span_type for r in rows} == {"email", "ipv4", "phone"}
    bad = [
        r
        for r in rows
        if not (r.span_matches_text and r.jvm_slice_match and r.class_count_match)
    ]
    assert not bad, bad[:3]
