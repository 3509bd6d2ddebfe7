"""URL canonicalization + domain-level corpus statistics.

The pre-dedup normalization pass every web-crawl training pipeline runs
before URL-level exact dedup (CCNet / RefinedWeb / FineWeb all dedup on a
normalized URL key): tracking-parameter stripping, case folding, fragment
removal, and stable query ordering collapse the cosmetic variants of one
page into one key, and per-domain rollups drive source-mixing decisions.
Reference parallel: the staging-layer key normalization in
models/staging/stg_*.sql (same rename/cast/clean shape, applied to URLs).

Every op is a per-row Catalyst expression battery (regexp + array HOFs,
no shuffle) except the domain rollup's single hash-agg, so the family
runs at parquet-scan speed at 100 TB. All expressions have exact DuckDB
twins (regexp_extract / list_filter / list_sort) for full oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization: the public
# utm_* convention plus the common click-id params. Kept as one regex so
# the Spark filter lambda and the DuckDB oracle share it verbatim.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

# Two-level public suffixes where the registered domain spans THREE
# labels (bbc.co.uk, not co.uk). A pinned subset of the Mozilla Public
# Suffix List covering the common ccTLD second-level conventions; a
# production deployment broadcasts the full PSL the same way. One regex
# so the Spark expression and the DuckDB oracle share it verbatim.
TWO_LEVEL_SUFFIX_RE = (
    r"\.(co|com|org|net|ac|gov|edu)\.(uk|au|jp|nz|br|in|za|kr|mx|id)$"
)


def canonicalize_urls(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Normalize URLs to a stable dedup key.

    Steps (each a pure expression):
      1. drop the ``#fragment``
      2. lowercase the host, strip one leading ``www.``
      3. drop tracking query params (``TRACKING_PARAM_RE``), sort the
         survivors lexicographically, rejoin with ``&``
      4. strip one trailing ``/`` from the path
      5. rebuild as ``https://host/path[?params]`` (scheme folded to
         https — crawls see both schemes for the same page)
      6. extract the registered domain — last two dot-labels, or last
         THREE when the host ends in a two-level public suffix
         (``TWO_LEVEL_SUFFIX_RE``: the co.uk / com.au class)

    Output: (doc_id, url, url_canon, domain) — one row per input row.
    """
    url = F.col(url_col)
    nofrag = F.substring_index(url, "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    host_raw = F.regexp_extract(base, r"^[a-zA-Z]+://([^/]+)", 1)
    host = F.regexp_replace(F.lower(host_raw), r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(base, r"^[a-zA-Z]+://[^/]*(/.*)?$", 1), r"/$", ""
    )
    # Everything after the FIRST '?' (a second literal '?' belongs to the
    # query string, not a new one) — regexp_extract returns '' on no match,
    # matching the oracle's CASE WHEN contains(...) guard exactly.
    params_raw = F.regexp_extract(nofrag, r"^[^?]*\?(.*)$", 1)
    kept_params = F.array_sort(
        F.filter(
            F.split(params_raw, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(
            F.size(kept_params) > 0,
            F.concat(F.lit("?"), F.array_join(kept_params, "&")),
        ).otherwise(F.lit("")),
    )
    domain = F.when(
        host.rlike(TWO_LEVEL_SUFFIX_RE),
        F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
    return df.select(
        F.col(id_col).alias("doc_id"),
        url.alias("url"),
        canon.alias("url_canon"),
        domain.alias("domain"),
    )


def domain_stats(canon: DataFrame) -> DataFrame:
    """Per-domain rollup of a ``canonicalize_urls`` relation.

    (domain, n_urls, n_canon, n_dup) where n_dup = rows whose canonical
    key collapsed with another row — the URL-level dup mass the
    canonicalization recovered. One hash-agg on the canonical key, one
    on domain; both partial-aggregable.
    """
    per_key = canon.groupBy("domain", "url_canon").agg(
        F.count("*").alias("k")
    )
    return per_key.groupBy("domain").agg(
        F.sum("k").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_canon"),
        (F.sum("k") - F.count("*")).cast("long").alias("n_dup"),
    )
