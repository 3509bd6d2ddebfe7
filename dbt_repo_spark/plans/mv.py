"""Materialized aggregate views with rollup-reuse rewrite.

The warehouse pattern behind BigQuery/Snowflake materialized views,
engine-side: materialize ONE fine-grained rollup (group by the superset
key), then answer every coarser aggregate from it with a second-level
re-aggregation instead of re-scanning the fact. At 100 TB the MV is
O(|key combinations|) — typically 10³-10⁶ rows against 10¹¹ fact rows —
so a dashboard fleet's queries collapse from repeated full scans to
broadcast-sized reads. (Reference parity: every `models/marts/*.sql`
is hand-materialized exactly for this reason; this makes the reuse
mechanical and verified instead of convention.)

Re-aggregation algebra (the partial/merge distinction Spark itself uses
map-side): SUM→SUM, COUNT→SUM of partial counts, MIN→MIN, MAX→MAX.
AVG is NOT stored — it does not merge — it derives as exact
SUM(sum)/SUM(count) at answer time. Asking for keys outside the MV's
key set, or a measure it cannot derive, returns None (the caller falls
back to the base scan — never a silently wrong answer).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class Measure:
    fn: str  # sum | count | min | max
    col: str | None = None  # None only for count

    def __post_init__(self):
        if self.fn not in _MERGE:
            raise ValueError(f"unsupported MV measure fn {self.fn!r}")
        if self.fn != "count" and self.col is None:
            raise ValueError(f"{self.fn} needs a source column")


@dataclass(frozen=True)
class AggMV:
    """A materialized rollup: ``source`` grouped by ``keys`` carrying
    ``measures`` (out_name -> Measure)."""

    name: str
    keys: tuple[str, ...]
    measures: dict[str, Measure] = field(default_factory=dict)
    layer: str = "analytics"

    def build(self, df: DataFrame, catalog: Catalog) -> DataFrame:
        aggs = []
        for out, m in self.measures.items():
            if m.fn == "count":
                aggs.append(F.count("*").cast("long").alias(out))
            else:
                aggs.append(getattr(F, m.fn)(m.col).alias(out))
        mv = df.groupBy(*self.keys).agg(*aggs)
        catalog.write(mv, self.layer, self.name, mode="overwrite")
        return catalog.read(self.layer, self.name)

    def refresh(self, df: DataFrame, catalog: Catalog) -> DataFrame:
        """Full rebuild — correct under arbitrary source mutation."""
        return self.build(df, catalog)

    def refresh_incremental(
        self, new_rows: DataFrame, catalog: Catalog
    ) -> DataFrame:
        """Append-only maintenance: aggregate ONLY the new rows (partial
        state), union with the stored MV, and merge with the same
        algebra the answer path uses (SUM/COUNT→SUM, MIN→MIN, MAX→MAX).
        Work is O(|batch| + |MV|), never a base re-scan — the shape that
        keeps a 10¹¹-row fact's rollup maintainable per micro-batch.
        Correct ONLY for appends (merge algebra has no inverse for
        deletes/updates — those need ``refresh``); equivalence to a full
        rebuild is pinned by test.
        """
        partial_aggs = []
        merge_aggs = []
        for out, m in self.measures.items():
            if m.fn == "count":
                partial_aggs.append(F.count("*").cast("long").alias(out))
            else:
                partial_aggs.append(getattr(F, m.fn)(m.col).alias(out))
            merged = _MERGE[m.fn](out)
            if m.fn == "count":
                merged = merged.cast("long")
            merge_aggs.append(merged.alias(out))
        batch = new_rows.groupBy(*self.keys).agg(*partial_aggs)
        current = catalog.read(self.layer, self.name)
        # align types: the stored sum may have widened (parquet decimal)
        batch = batch.select(*[F.col(c).cast(dict(current.dtypes)[c]) for c in current.columns])
        merged_mv = (
            current.unionByName(batch).groupBy(*self.keys).agg(*merge_aggs)
        )
        catalog.overwrite_staged(merged_mv, self.layer, self.name)
        return catalog.read(self.layer, self.name)

    # ---- rewrite ----------------------------------------------------

    def can_answer(
        self, keys: list[str], measures: dict[str, tuple[str, str | None]]
    ) -> bool:
        if not set(keys) <= set(self.keys):
            return False
        for fn, col in measures.values():
            if fn == "avg":
                if self._find("sum", col) is None or self._find("count", None) is None:
                    return False
            elif fn in _MERGE:
                if self._find(fn, col if fn != "count" else None) is None:
                    return False
            else:
                return False
        return True

    def _find(self, fn: str, col: str | None) -> str | None:
        for out, m in self.measures.items():
            if m.fn == fn and m.col == col:
                return out
        return None

    def answer(
        self,
        catalog: Catalog,
        keys: list[str],
        measures: dict[str, tuple[str, str | None]],
    ) -> DataFrame | None:
        """Answer ``SELECT keys, measures FROM source GROUP BY keys``
        from the MV, or None if not derivable. ``measures`` maps output
        name -> (fn, source_col); fn in sum|count|min|max|avg.

        Exactness: second-level SUM of partial decimal sums is the same
        order-independent fold the direct aggregate performs, so MV-path
        results are bit-identical to base-path results (verified in
        tests against the direct plan).
        """
        if not self.can_answer(keys, measures):
            return None
        mv = catalog.read(self.layer, self.name)
        aggs = []
        for out, (fn, col) in measures.items():
            if fn == "avg":
                s = self._find("sum", col)
                c = self._find("count", None)
                aggs.append(
                    (F.sum(s).cast("double") / F.sum(c).cast("double")).alias(out)
                )
            else:
                src = self._find(fn, col if fn != "count" else None)
                agg = _MERGE[fn](src)
                if fn == "count":
                    agg = agg.cast("long")
                aggs.append(agg.alias(out))
        if not keys:
            return mv.agg(*aggs)
        return mv.groupBy(*keys).agg(*aggs)


def answer_or_base(
    mvs: list[AggMV],
    catalog: Catalog,
    base: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> tuple[DataFrame, str]:
    """Route a rollup query: first MV that can answer wins; otherwise
    compute from the base scan. Returns (frame, 'mv:<name>' | 'base')
    so callers can assert the path in tests and dashboards can report
    scan savings."""
    for mv in mvs:
        got = mv.answer(catalog, keys, measures)
        if got is not None:
            return got, f"mv:{mv.name}"
    aggs = []
    for out, (fn, col) in measures.items():
        if fn == "avg":
            # same sum/count(*) fold as the MV derivation, so both paths
            # are bit-identical. NOTE: this is the per-ROW mean — it
            # assumes the measure column is non-null (fact columns are);
            # a nullable measure needs a count(col) measure in the MV.
            aggs.append(
                (F.sum(col).cast("double") / F.count("*").cast("double")).alias(out)
            )
        elif fn == "count":
            aggs.append(F.count("*").cast("long").alias(out))
        else:
            aggs.append(getattr(F, fn)(col).alias(out))
    frame = base.agg(*aggs) if not keys else base.groupBy(*keys).agg(*aggs)
    return frame, "base"
