"""Web-crawl preprocessing query family (round-7 additions).

Two production shapes every crawl-derived training corpus runs BEFORE the
dedup/quality passes the repo already covers:

- C4-style line-level cleanup (Raffel et al. 2020 §2.2): terminal-
  punctuation / min-words / javascript / code-brace line filters plus the
  lorem-ipsum and min-lines document gates (`text.c4_line_cleanup`).
- URL canonicalization + domain rollup (the CCNet/RefinedWeb/FineWeb
  URL-dedup key): fragment/tracking-param stripping, case folding,
  stable param order, registered-domain extraction (`web.canonicalize_urls`,
  `web.domain_stats`).

The synthetic corpus is newline-free and URL-free, so each query first
DERIVES the structure it filters — line breaks, decorations (terminal
punctuation on ~half the lines, 1/16 javascript / code-brace / lorem
injections), and URLs (scheme/www/case/tld/trailing-slash/param-order/
fragment variants) — content-addressed from md5(doc_id, position), the
same seeded-fixture pattern as the PII and contrastive-sampling
oracles: the DuckDB SQL reproduces the synthesis bit-exactly, so the
CHECK covers the real operator logic end-to-end. On real crawl text the
synthesis stage disappears and the operators run unchanged.

Cross-engine exactness: everything here is strings, integers, and
booleans — no float columns at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.operators import text as text_ops
from dbt_repo_spark.operators import web
from dbt_repo_spark.operators.dedup import tokens
from dbt_repo_spark.queries import q, t

_LINE_TOKENS = 8

# DuckDB nibble idiom (0-15 from hex digit k of an md5): shared textual
# form so every oracle spells it identically.
_NIB = "instr('0123456789abcdef', substr(md5({key}), {pos}, 1)) - 1"


def _synth_lines(df: DataFrame) -> DataFrame:
    """Derive a newline-structured, C4-decorated corpus from `documents`.

    Lines are fixed 8-token blocks (the paragraph-dedup convention).
    Content-addressed decorations from md5(doc_id:':':line_no):
      nibble1 < 8  -> line ends with terminal '.'
      nibble2 == 0 -> line gains the token 'javascript'  (~1/16)
      nibble3 == 0 -> line gains a code brace '{'        (~1/16)
    and docs where md5(doc_id:':lorem') nibble1 == 0 are prefixed with a
    'lorem ipsum dolor sit amet.' line (~1/16 of docs).
    """
    w = tokens(F.col("text"))
    nb = F.ceil(F.size(w) / F.lit(float(_LINE_TOKENS))).cast("int")
    did = F.col("doc_id").cast("string")

    def build(i):  # i: 1-based line number (Column)
        base = F.array_join(
            F.slice(w, (i - 1) * _LINE_TOKENS + 1, _LINE_TOKENS), " "
        )
        key = F.md5(F.concat(did, F.lit(":"), i.cast("string")))

        def nib(pos):
            return F.conv(F.substring(key, pos, 1), 16, 10).cast("int")

        return F.concat(
            base,
            F.when(nib(2) == 0, F.lit(" javascript")).otherwise(F.lit("")),
            F.when(nib(3) == 0, F.lit(" {")).otherwise(F.lit("")),
            F.when(nib(1) < 8, F.lit(".")).otherwise(F.lit("")),
        )

    idx = F.when(nb >= 1, F.sequence(F.lit(1), nb)).otherwise(
        F.array().cast("array<int>")
    )
    body = F.array_join(F.transform(idx, build), "\n")
    lorem_key = F.md5(F.concat(did, F.lit(":lorem")))
    is_lorem = F.conv(F.substring(lorem_key, 1, 1), 16, 10).cast("int") == 0
    text_nl = F.when(
        is_lorem, F.concat(F.lit("lorem ipsum dolor sit amet.\n"), body)
    ).otherwise(body)
    return df.select("doc_id", text_nl.alias("text_nl"))


_C4_SYNTH_CTES = f"""
    toks AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                        x -> x <> '') AS w
             FROM documents),
    sized AS (SELECT doc_id, w,
                     CAST(ceil(len(w) / {_LINE_TOKENS}.0) AS INT) AS nb
              FROM toks),
    lines AS (SELECT doc_id, i AS ln,
                     array_to_string(list_slice(w, (i-1)*{_LINE_TOKENS} + 1,
                                                i*{_LINE_TOKENS}), ' ')
                     || CASE WHEN {_NIB.format(key="doc_id || ':' || i", pos=2)} = 0
                             THEN ' javascript' ELSE '' END
                     || CASE WHEN {_NIB.format(key="doc_id || ':' || i", pos=3)} = 0
                             THEN ' {{' ELSE '' END
                     || CASE WHEN {_NIB.format(key="doc_id || ':' || i", pos=1)} < 8
                             THEN '.' ELSE '' END AS line
              FROM sized, UNNEST(range(1, nb + 1)) AS u(i)
              WHERE nb >= 1),
    body AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS b
             FROM lines GROUP BY 1),
    synth AS (SELECT s.doc_id,
                     CASE WHEN {_NIB.format(key="s.doc_id || ':lorem'", pos=1)} = 0
                          THEN 'lorem ipsum dolor sit amet.' || chr(10)
                               || COALESCE(b.b, '')
                          ELSE COALESCE(b.b, '') END AS text_nl
              FROM sized s LEFT JOIN body b USING (doc_id))
"""


@q(
    "text_c4_cleanup",
    f"""
    WITH {_C4_SYNTH_CTES},
    split AS (SELECT doc_id, text_nl,
                     string_split(text_nl, chr(10)) AS ls,
                     list_filter(string_split(text_nl, chr(10)), x ->
                         regexp_matches(x, '[.!?"]$')
                         AND len(string_split(x, ' ')) >= 5
                         AND NOT contains(lower(x), 'javascript')
                         AND NOT contains(x, '{{')
                         AND NOT contains(x, '}}')) AS kept
              FROM synth)
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           contains(lower(text_nl), 'lorem ipsum') AS has_lorem,
           (len(kept) >= 3 AND NOT contains(lower(text_nl), 'lorem ipsum'))
             AS doc_kept,
           -- DuckDB's array_to_string is NULL on an empty list; Spark's
           -- array_join is '' — align on ''
           COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
    FROM split
    """,
)
def text_c4_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 heuristic cleanup (text.py::c4_line_cleanup) over the
    line-decorated corpus: ~half the derived lines lack terminal
    punctuation, 1/16 carry a javascript token or a code brace, remainder
    blocks fall under the 5-word floor, and 1/16 of docs gain a
    lorem-ipsum line — so every C4 rule fires non-vacuously (the seeded
    PII pattern). Pure per-row expressions end-to-end: zero shuffles.
    """
    docs = _synth_lines(t(spark, sf_dir, "documents"))
    return text_ops.c4_line_cleanup(docs, "doc_id", "text_nl")


_URL_SYNTH_CTES = f"""
    uk AS (SELECT doc_id, source, md5(doc_id || ':url') AS k FROM documents),
    nib AS (SELECT doc_id, source,
                   {_NIB.format(key="doc_id || ':url'", pos=1)} AS m1,
                   {_NIB.format(key="doc_id || ':url'", pos=2)} AS m2,
                   {_NIB.format(key="doc_id || ':url'", pos=3)} AS m3,
                   {_NIB.format(key="doc_id || ':url'", pos=4)} AS m4,
                   {_NIB.format(key="doc_id || ':url'", pos=5)} AS m5,
                   {_NIB.format(key="doc_id || ':url'", pos=6)} AS m6,
                   {_NIB.format(key="doc_id || ':url'", pos=7)} AS m7
            FROM uk),
    urls AS (SELECT doc_id,
                    (CASE WHEN m1 < 8 THEN 'https' ELSE 'HTTP' END)
                    || '://'
                    || (CASE WHEN m2 < 8 THEN 'WWW.' ELSE '' END)
                    || (CASE WHEN m3 < 8 THEN upper(source) ELSE source END)
                    || '-site.'
                    || (['com', 'org', 'net', 'io'])[(m4 % 4) + 1]
                    || '/docs/' || (doc_id % 25)
                    || (CASE WHEN m5 < 8 THEN '/' ELSE '' END)
                    || '?'
                    || (CASE WHEN m6 < 8 THEN 'utm_source=feed&b=2&a=1'
                             ELSE 'a=1&b=2&utm_campaign=x' END)
                    || (CASE WHEN m7 < 8 THEN '#top' ELSE '' END) AS url
             FROM nib),
    canon AS (SELECT doc_id, url,
                     'https://' || host || path
                     || (CASE WHEN len(kept) > 0
                              THEN '?' || array_to_string(kept, '&')
                              ELSE '' END) AS url_canon,
                     regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
              FROM (SELECT doc_id, url,
                           regexp_replace(lower(regexp_extract(base,
                               '^[a-zA-Z]+://([^/]+)', 1)), '^www\\.', '')
                             AS host,
                           regexp_replace(regexp_extract(base,
                               '^[a-zA-Z]+://[^/]*(/.*)?$', 1), '/$', '')
                             AS path,
                           list_sort(list_filter(string_split(
                               CASE WHEN contains(nofrag, '?')
                                    THEN split_part(nofrag, '?', 2)
                                    ELSE '' END, '&'),
                               p -> p <> '' AND NOT regexp_matches(p,
                                   '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)=')))
                             AS kept
                    FROM (SELECT doc_id, url,
                                 split_part(url, '#', 1) AS nofrag,
                                 split_part(split_part(url, '#', 1), '?', 1)
                                   AS base
                          FROM urls)))
"""


def _synth_urls(df: DataFrame) -> DataFrame:
    """Derive one crawl-shaped URL per document, content-addressed from
    md5(doc_id:':url'): scheme case, a www. prefix, host case, one of 4
    TLDs, a doc_id%25 path (seeding genuine canonical collisions),
    a trailing slash, scrambled param order with tracking params, and a
    fragment — every variant the canonicalizer must collapse."""
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":url")))

    def nib(pos):
        return F.conv(F.substring(k, pos, 1), 16, 10).cast("int")

    url = F.concat(
        F.when(nib(1) < 8, F.lit("https")).otherwise(F.lit("HTTP")),
        F.lit("://"),
        F.when(nib(2) < 8, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(nib(3) < 8, F.upper("source")).otherwise(F.col("source")),
        F.lit("-site."),
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net"), F.lit("io")),
            (nib(4) % 4) + 1,
        ),
        F.lit("/docs/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(nib(5) < 8, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(nib(6) < 8, F.lit("utm_source=feed&b=2&a=1")).otherwise(
            F.lit("a=1&b=2&utm_campaign=x")
        ),
        F.when(nib(7) < 8, F.lit("#top")).otherwise(F.lit("")),
    )
    return df.select("doc_id", url.alias("url"))


@q(
    "web_url_canonical",
    f"""
    WITH {_URL_SYNTH_CTES}
    SELECT doc_id, url, url_canon, domain FROM canon
    """,
)
def web_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (web.py::canonicalize_urls) over the
    synthesized crawl URLs: collapses scheme/www/case/trailing-slash/
    param-order/tracking/fragment variants to one stable dedup key and
    extracts the registered domain. Per-row expressions only — no
    shuffle, runs at scan speed at 100 TB.
    """
    urls = _synth_urls(t(spark, sf_dir, "documents"))
    return web.canonicalize_urls(urls, "doc_id", "url")


@q(
    "web_domain_stats",
    f"""
    WITH {_URL_SYNTH_CTES},
    per_key AS (SELECT domain, url_canon, COUNT(*) AS c
                FROM canon GROUP BY 1, 2)
    SELECT domain,
           CAST(SUM(c) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_canon,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup
    FROM per_key GROUP BY 1
    """,
)
def web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup (web.py::domain_stats): URL mass, distinct
    canonical keys, and the dup mass canonicalization recovered — the
    relation source-mixing decisions read. Two partial-aggregable
    hash-aggs; doc_id%25 path collisions make n_dup non-vacuous.
    """
    urls = _synth_urls(t(spark, sf_dir, "documents"))
    return web.domain_stats(web.canonicalize_urls(urls, "doc_id", "url"))
