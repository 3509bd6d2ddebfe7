"""Model runner: DAG of DataFrame builders + materializations.

Replaces dbt's manifest/Jinja layer (SURVEY.md §3.1). A model is a Python
function ``(ctx) -> DataFrame``; ``ref()``/``source()`` become dict
lookups; the IR between models is the Catalyst logical plan itself, so
``ephemeral`` materialization is literally free — downstream models compose
into ONE plan and Catalyst pushes predicates/prunes columns across the
whole chain (dbt_project.yml:46-48 ephemeral src layer).

Materializations (SURVEY.md §2.11 D1-D5):
- ephemeral   — pass the lazy DataFrame through (no persistence).
- view        — register a temp view (dbt_project.yml:52-54).
- table       — overwrite parquet in the catalog (dbt_project.yml:58-72).
- incremental — first run full write; later runs anti-join new rows against
  the existing target on ``unique_key`` then APPEND — exactly the
  reference's NOT-IN template (models/facts/fact_station_status.sql:30-32,
  fact_station_status_history.sql:24-26). The target snapshot is read
  BEFORE the write so the model never reads its own writes (§7.3 risk 1);
  md5 keys are non-null so anti-join ≡ NOT IN (§7.3 risk 3).
  Strategies beyond the reference: ``insert_overwrite`` (dynamic partition
  replace), ``merge`` (upsert by unique_key via staged rewrite,
  partition-scoped when partition_by is set — dbt's
  incremental_strategy='merge' on top of immutable parquet), and
  ``microbatch`` (dbt 1.9: event-time period splitting with a lookback
  window — bounded, idempotent, retry-safe late-data reprocessing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.sources.catalog import Catalog

MATERIALIZATIONS = ("ephemeral", "view", "table", "incremental", "versioned_table")


@dataclass
class Model:
    name: str
    fn: Callable
    deps: tuple[str, ...] = ()
    materialized: str = "ephemeral"
    layer: str = "analytics"
    unique_key: str | None = None
    partition_by: list[str] | None = None
    cluster_by: list[str] | None = None
    incremental_strategy: str = "append"  # append (anti-join) | insert_overwrite | merge
    tests: dict = field(default_factory=dict)
    tags: tuple[str, ...] = ()
    # dbt on_schema_change for incrementals: what to do when the batch's
    # schema drifts from the existing target (ignore = align to target,
    # append_new_columns = evolve, fail = refuse)
    on_schema_change: str = "ignore"
    # microbatch strategy config (dbt 1.9 incremental_strategy='microbatch'):
    # event_time column, batch period ('day'|'hour'|'month'), and how many
    # RECENT periods to reprocess (late-data window); older periods in the
    # input are dropped, never rewritten
    event_time: str | None = None
    batch_size: str = "day"
    lookback: int = 1
    # dbt model contract (contract: enforced): declared output schema
    # {column: spark dtype simpleString}; the build FAILS if the built
    # frame's schema differs — consumers can rely on the shape
    contract: dict | None = None

    def fingerprint(self) -> str:
        """Content hash for Slim-CI state comparison: the builder's
        bytecode + consts + every behavior-bearing config field. Doc
        or comment edits don't change it; logic or config edits do.
        Nested code objects (a lambda or inner def in the builder) are
        folded RECURSIVELY by their own co_code/co_consts — their repr
        embeds a memory address and absolute file path, which would
        change every process/checkout and make state:modified
        over-select those models, defeating Slim CI."""
        import hashlib
        import types

        def fold(const):
            if isinstance(const, types.CodeType):
                return (
                    "<code>",
                    const.co_code,
                    const.co_names,
                    const.co_varnames,
                    tuple(fold(c) for c in const.co_consts),
                )
            if isinstance(const, tuple):
                return tuple(fold(c) for c in const)
            if isinstance(const, frozenset):
                return ("<frozenset>",) + tuple(
                    sorted(repr(fold(c)) for c in const)
                )
            return const

        payload = repr((
            fold(self.fn.__code__),
            self.deps, self.materialized, self.layer, self.unique_key,
            self.partition_by, self.cluster_by, self.incremental_strategy,
            self.on_schema_change, self.event_time, self.batch_size,
            self.lookback, self.contract,
        ))
        return hashlib.md5(payload.encode()).hexdigest()

    def __post_init__(self):
        if self.materialized not in MATERIALIZATIONS:
            raise ValueError(f"unknown materialization {self.materialized!r}")
        if self.incremental_strategy not in (
            "append", "insert_overwrite", "merge", "microbatch"
        ):
            raise ValueError(
                f"unknown incremental_strategy {self.incremental_strategy!r}"
            )
        if self.on_schema_change not in ("ignore", "append_new_columns", "fail"):
            raise ValueError(f"unknown on_schema_change {self.on_schema_change!r}")
        if self.materialized == "incremental":
            if self.incremental_strategy in ("append", "merge") and not self.unique_key:
                raise ValueError(f"incremental model {self.name} needs unique_key")
            if self.incremental_strategy == "insert_overwrite" and not self.partition_by:
                raise ValueError(
                    f"insert_overwrite model {self.name} needs partition_by"
                )
            if self.incremental_strategy == "microbatch":
                if not self.event_time:
                    raise ValueError(
                        f"microbatch model {self.name} needs event_time"
                    )
                if self.batch_size not in ("hour", "day", "month"):
                    raise ValueError(
                        f"unknown batch_size {self.batch_size!r}"
                    )
                if self.lookback < 1:
                    raise ValueError("lookback must be >= 1")


def model(
    name: str,
    deps: tuple[str, ...] = (),
    materialized: str = "ephemeral",
    layer: str = "analytics",
    unique_key: str | None = None,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    incremental_strategy: str = "append",
    tests: dict | None = None,
    tags: tuple[str, ...] = (),
    on_schema_change: str = "ignore",
    event_time: str | None = None,
    batch_size: str = "day",
    lookback: int = 1,
    contract: dict | None = None,
):
    """Decorator registering a DataFrame-builder as a model.

    The builder receives ``ctx: dict[str, DataFrame]`` holding its deps
    (refs and sources alike) plus the SparkSession under ``"spark"``.
    """

    def wrap(fn: Callable) -> Model:
        return Model(
            name=name,
            fn=fn,
            deps=deps,
            materialized=materialized,
            layer=layer,
            unique_key=unique_key,
            partition_by=partition_by,
            cluster_by=cluster_by,
            incremental_strategy=incremental_strategy,
            tests=tests or {},
            tags=tags,
            on_schema_change=on_schema_change,
            event_time=event_time,
            batch_size=batch_size,
            lookback=lookback,
            contract=contract,
        )

    return wrap


@dataclass(frozen=True)
class Exposure:
    """dbt exposure: a declared downstream consumer (dashboard, ML job,
    notebook) whose upstream models become selectable as a unit
    (``exposure:<name>`` selector) and visible in the manifest — the
    impact-analysis edge dbt draws from the warehouse to the outside
    world (reference: every mart in `models/marts/` feeds a Looker
    dashboard the repo itself never declares; this makes that edge
    explicit)."""

    name: str
    depends_on: tuple[str, ...]
    kind: str = "dashboard"  # dashboard | ml | notebook | application
    owner: str = ""
    url: str = ""


class ModelRunner:
    """Topo-sorts and materializes a set of models (dbt run/test analog)."""

    def __init__(self, spark: SparkSession, catalog: Catalog, sources: dict[str, DataFrame]):
        self.spark = spark
        self.catalog = catalog
        self.sources = dict(sources)
        self.models: dict[str, Model] = {}
        self.exposures: dict[str, Exposure] = {}
        self._state: dict | None = None
        self._defer: Catalog | None = None
        self._observe: bool = False
        # model name -> {"rows_built": n, "null_keys": n} from the last
        # observed run (Observation API: no extra scan)
        self.last_run_metrics: dict[str, dict] = {}
        # full query-execution text of the most recent incremental
        # anti-join (captured BEFORE the append executes): lets tests
        # and operators pin that the {{ this }} read pruned to the key
        # column — the property that keeps a 100 TB target's tick cost
        # at O(new batch + key column), not O(full-width target).
        # Capture is OPT-IN (capture_plans=True): rendering the full
        # analyzed/optimized/physical plan string is driver-side work
        # proportional to DAG width, and the _jdf access it needs is
        # classic-Spark-only — tests that pin the plan enable it.
        self.capture_plans: bool = False
        self.last_incremental_plan: str | None = None

    def add(self, *models: Model) -> "ModelRunner":
        for m in models:
            self.models[m.name] = m
        return self

    def add_exposure(self, *exposures: Exposure) -> "ModelRunner":
        for e in exposures:
            unknown = [d for d in e.depends_on if d not in self.models]
            if unknown:
                raise ValueError(
                    f"exposure {e.name}: unknown model deps {unknown} "
                    "(add models before exposures)"
                )
            self.exposures[e.name] = e
        return self

    def manifest(self) -> dict[str, str]:
        """name -> fingerprint map (dbt manifest analog for Slim CI)."""
        return {name: m.fingerprint() for name, m in self.models.items()}

    def write_manifest(self, path: str) -> None:
        import json

        with open(path, "w") as fh:
            json.dump(self.manifest(), fh, indent=1, sort_keys=True)

    def _resolve_selector(self, tokens: list[str]) -> set[str]:
        """dbt-style graph selectors: ``name`` / ``+name`` (upstream
        closure — applied to every selection here anyway, since deps must
        build), ``name+`` (the node plus its transitive DOWNSTREAM
        consumers — dbt's rebuild-what-this-feeds), ``+name+``, and
        ``tag:x`` (every model carrying the tag). Unknown plain names are
        silently skipped (pre-existing tolerance); an unknown tag selects
        nothing.
        """
        children: dict[str, set[str]] = {}
        for name, m in self.models.items():
            for d in m.deps:
                children.setdefault(d, set()).add(name)
        sel: set[str] = set()
        for tok in tokens:
            core = tok.lstrip("+")
            downstream = core.endswith("+")
            core = core.rstrip("+")
            if core.startswith("tag:"):
                base = {
                    n for n, m in self.models.items() if core[4:] in m.tags
                }
            elif core == "state:modified":
                # Slim CI: models whose fingerprint differs from the
                # baseline manifest (or absent from it). Requires a
                # state passed to run(); combine with a trailing + to
                # also rebuild consumers ("state:modified+").
                if self._state is None:
                    raise ValueError(
                        "state:modified needs state= (a manifest dict "
                        "or path) passed to run()"
                    )
                base = {
                    n for n, m in self.models.items()
                    if self._state.get(n) != m.fingerprint()
                }
            elif core.startswith("exposure:"):
                # the exposure's declared upstream models; the normal
                # upstream closure in _order pulls their refs. A typo'd
                # exposure is a config error, not a tolerated miss.
                ename = core[len("exposure:"):]
                if ename not in self.exposures:
                    raise ValueError(f"unknown exposure {ename!r}")
                base = set(self.exposures[ename].depends_on)
            else:
                base = {core} if core in self.models else set()
            sel |= base
            if downstream:
                # traversal bookkeeping is SEPARATE from sel: a child
                # already selected by an earlier token must still be
                # traversed, or its own consumers are silently dropped
                visited: set[str] = set()
                stack = list(base)
                while stack:
                    n = stack.pop()
                    for c in children.get(n, ()):
                        if c not in visited:
                            visited.add(c)
                            sel.add(c)
                            stack.append(c)
        return sel

    def _order(self, selected: list[str] | None = None) -> list[str]:
        graph = {
            name: {d for d in m.deps if d in self.models}
            for name, m in self.models.items()
        }
        order = list(TopologicalSorter(graph).static_order())
        if selected is None:
            return order
        # resolve selector tokens, then include the upstream closure
        # (refs must exist before a selected model can build). Under
        # --defer, an UNSELECTED upstream that the deferred (production)
        # catalog already holds is NOT rebuilt — its ref resolves from
        # prod at build time. Selected models always build locally
        # (dbt's favor-local rule), and a dep absent from prod falls
        # back to building here.
        sel = self._resolve_selector(selected)
        needed: set[str] = set()

        def deferred(n: str) -> bool:
            return (
                self._defer is not None
                and n not in sel
                and self._defer.exists(self.models[n].layer, n)
            )

        def visit(n: str) -> None:
            if n in needed or n not in self.models or deferred(n):
                return
            needed.add(n)
            for d in self.models[n].deps:
                visit(d)

        for s in sel:
            visit(s)
        return [n for n in order if n in needed]

    def run(
        self,
        selected: list[str] | None = None,
        full_refresh: bool = False,
        parallelism: int = 1,
        state: "dict | str | None" = None,
        defer_to: "Catalog | None" = None,
        observe: bool = False,
    ) -> dict[str, DataFrame]:
        """Build every model in dependency order; returns name → DataFrame.

        Returned frames for persisted models re-read from storage so
        downstream consumers scan the materialized (partition-pruned,
        clustered) parquet rather than recomputing the plan.

        ``parallelism > 1`` materializes INDEPENDENT models concurrently
        (dbt's --threads): the Spark driver schedules jobs from multiple
        threads into one shared cluster, so sibling models overlap their
        scans/shuffles instead of leaving the cluster idle between
        driver-side planning phases. Dependency order is preserved — a
        model is submitted only after everything it refs has
        materialized (wave-free: each model waits on exactly its own
        deps, not on its topological generation).
        """
        if isinstance(state, str):
            import json

            with open(state) as fh:
                state = json.load(fh)
        self._state = state
        # dbt --defer: refs to models NOT built in this run resolve from
        # the deferred catalog (the Slim-CI partner of state:modified —
        # build only what changed, read everything else from prod)
        self._defer = defer_to
        self._observe = observe
        if observe:
            self.last_run_metrics = {}
        order = self._order(selected)
        if parallelism <= 1:
            built: dict[str, DataFrame] = {}
            for name in order:
                built[name] = self._build_one(name, built, full_refresh)
            return built

        from concurrent.futures import Future, ThreadPoolExecutor

        futures: dict[str, Future] = {}
        with ThreadPoolExecutor(max_workers=parallelism) as pool:

            def make_task(name: str):
                def task():
                    deps_built = {
                        d: futures[d].result()
                        for d in self.models[name].deps
                        if d in futures
                    }
                    return self._build_one(name, deps_built, full_refresh)

                return task

            for name in order:  # topo order: deps' futures exist first
                futures[name] = pool.submit(make_task(name))
            return {name: f.result() for name, f in futures.items()}

    def _build_one(
        self, name: str, built: dict[str, DataFrame], full_refresh: bool
    ) -> DataFrame:
        m = self.models[name]
        ctx: dict = {"spark": self.spark}
        for d in m.deps:
            if d in built:
                ctx[d] = built[d]
            elif d in self.sources:
                ctx[d] = self.sources[d]
            elif (
                self._defer is not None
                and d in self.models
                and self._defer.exists(self.models[d].layer, d)
            ):
                # path-based read: the deferred catalog's views are not
                # registered in this session (it is another environment)
                ctx[d] = self._defer.read(self.models[d].layer, d)
            else:
                raise KeyError(f"model {name}: unresolved dependency {d!r}")
        df = m.fn(ctx)
        if self._observe and m.materialized in ("table", "incremental",
                                                "versioned_table"):
            # Spark Observation API: per-model run metrics (rows built,
            # null keys) collected DURING the materializing job itself —
            # dbt's "rows affected" line without a second scan. Metrics
            # land in self.last_run_metrics[name] after the write action.
            from pyspark.sql import Observation

            obs = Observation(f"obs_{name}")
            metrics = [F.count(F.lit(1)).alias("rows_built")]
            if m.unique_key and m.unique_key in df.columns:
                metrics.append(
                    F.sum(
                        F.when(F.col(m.unique_key).isNull(), 1).otherwise(0)
                    ).alias("null_keys")
                )
            df = df.observe(obs, *metrics)
            out = self._materialize(m, df, full_refresh)
            self.last_run_metrics[name] = dict(obs.get)
            return out
        return self._materialize(m, df, full_refresh)

    def _materialize(self, m: Model, df: DataFrame, full_refresh: bool) -> DataFrame:
        if m.contract is not None:
            got = dict(df.dtypes)
            if got != m.contract:
                missing = sorted(set(m.contract) - set(got))
                extra = sorted(set(got) - set(m.contract))
                drifted = sorted(
                    c for c in set(got) & set(m.contract)
                    if got[c] != m.contract[c]
                )
                raise ValueError(
                    f"model {m.name}: contract violation — "
                    f"missing {missing}, extra {extra}, type-drifted "
                    f"{[(c, m.contract[c], got[c]) for c in drifted]}"
                )
        if m.materialized == "ephemeral":
            return df
        if m.materialized == "view":
            df.createOrReplaceTempView(m.name)
            return df
        if m.materialized == "versioned_table":
            # full-table commit into the version log: every run is a
            # time-travelable state, and a bad deploy rolls back with
            # one log write (sources/versioned.py). The returned frame
            # reads the committed version (not the plan).
            from dbt_repo_spark.sources.versioned import VersionedTable

            vt = VersionedTable(self.catalog, m.layer, m.name)
            v = vt.commit(df, message=f"run {m.name}")
            return vt.read(version=v)
        if m.materialized == "table":
            self.catalog.write(
                df, m.layer, m.name,
                mode="overwrite",
                partition_by=m.partition_by,
                sort_within_partitions=m.cluster_by,
            )
            return self.catalog.read(m.layer, m.name)
        # incremental
        target_exists = self.catalog.exists(m.layer, m.name) and not full_refresh
        if m.incremental_strategy == "microbatch":
            return self._materialize_microbatch(m, df, target_exists)
        if target_exists and m.incremental_strategy == "insert_overwrite":
            # Partition-overwrite path (SURVEY.md §4 scale policy): when
            # the batch's rows fully own their partitions (e.g. a daily
            # reprocess), replacing just those partitions beats the
            # NOT-IN/anti-join — no scan of the existing target at all.
            # Dynamic mode rewrites only partitions present in ``df``.
            # on_schema_change applies here too: the "no scan of the
            # target" property survives because reconciliation needs only
            # the target SCHEMA (a footer read), not its rows; skipping
            # it would let a drifted batch overwrite its partitions with
            # a forked schema even under policy 'fail'.
            evolved = m.on_schema_change == "append_new_columns"
            target = self.catalog.read(m.layer, m.name, merge_schema=evolved)
            df = self._reconcile_schema(m, df, target)
            self.catalog.write(
                df, m.layer, m.name,
                mode="overwrite",
                partition_by=m.partition_by,
                sort_within_partitions=m.cluster_by,
                dynamic_partition_overwrite=True,  # per-writer: thread-safe
            )
            # untouched partitions keep the pre-drift schema after an
            # evolving overwrite — reads reconcile via mergeSchema
            return self.catalog.read(m.layer, m.name, merge_schema=evolved)
        if target_exists and m.incremental_strategy == "merge":
            # Upsert (dbt incremental_strategy='merge'): keep target rows
            # whose key is NOT in the batch, union the batch, staged-swap.
            # With partition_by the rewrite is scoped to the partitions the
            # batch touches (untouched partitions are never read or moved);
            # unpartitioned targets pay a full rewrite — that is inherent
            # to upsert-on-immutable-files, and the reason the reference's
            # own incremental models are append-only (fact_station_status
            # .sql:30-32). MERGE exists for the correction/backfill case.
            evolved = m.on_schema_change == "append_new_columns"
            target = self.catalog.read(m.layer, m.name, merge_schema=evolved)
            df = self._reconcile_schema(m, df, target)
            if m.partition_by:
                parts = df.select(*m.partition_by).distinct()
                target = target.join(
                    F.broadcast(parts), m.partition_by, "left_semi"
                )
            keys = df.select(m.unique_key).distinct()
            kept = target.join(keys, m.unique_key, "left_anti")
            merged = kept.unionByName(df, allowMissingColumns=evolved)
            self.catalog.overwrite_staged(
                merged, m.layer, m.name,
                partition_by=m.partition_by,
                sort_within_partitions=m.cluster_by,
                replace_partitions_only=bool(m.partition_by),
            )
            # partition-scoped rewrites leave untouched partitions on the
            # pre-drift schema, so an evolved table still needs the merge
            return self.catalog.read(m.layer, m.name, merge_schema=evolved)
        if target_exists:
            # is_incremental() branch: anti-join against {{ this }} keys,
            # then append. Key set is projected to ONE column before the
            # join so the scan of the existing target prunes to the key
            # column only (column pruning hits parquet ReadSchema).
            evolved = m.on_schema_change == "append_new_columns"
            target = self.catalog.read(m.layer, m.name, merge_schema=evolved)
            df = self._reconcile_schema(m, df, target)
            existing_keys = target.select(m.unique_key)
            new_rows = df.join(
                F.broadcast(existing_keys.distinct())
                if self._small_enough(existing_keys)
                else existing_keys.distinct(),
                m.unique_key,
                "left_anti",
            )
            if self.capture_plans:
                self.last_incremental_plan = (
                    new_rows._jdf.queryExecution().toString()
                )
            self.catalog.write(
                new_rows, m.layer, m.name,
                mode="append",
                partition_by=m.partition_by,
                sort_within_partitions=m.cluster_by,
            )
            return self.catalog.read(m.layer, m.name, merge_schema=evolved)
        self.catalog.write(
            df, m.layer, m.name,
            mode="overwrite",
            partition_by=m.partition_by,
            sort_within_partitions=m.cluster_by,
        )
        return self.catalog.read(m.layer, m.name)

    def _materialize_microbatch(
        self, m: Model, df: DataFrame, target_exists: bool
    ) -> DataFrame:
        """dbt 1.9 ``incremental_strategy='microbatch'``: the input is
        split into event-time periods (``batch_size``), and only the
        most recent ``lookback`` periods — anchored on the INPUT's max
        event time — are (re)written, each as an independent dynamic
        partition overwrite. Periods older than the lookback window are
        DROPPED from the batch (late data beyond the window is a
        deliberate backfill, run with ``full_refresh``), and untouched
        target periods are never read or rewritten.

        Why this is the 100 TB late-data shape: the append strategy's
        anti-join must scan the target's keys every run, and plain
        insert_overwrite trusts the batch to own its partitions — a
        replayed feed would resurrect old periods. Microbatch bounds
        every run's write surface to ``lookback`` periods regardless of
        how stale the replayed input is, making runs idempotent AND
        retry-safe per period. The table is partitioned by the derived
        ``batch_period`` column (overriding partition_by), so period
        pruning reaches every downstream scan.
        """
        import datetime as _dt

        per = F.date_trunc(m.batch_size, F.col(m.event_time))
        df2 = df.withColumn("batch_period", per)
        if not target_exists:
            self.catalog.write(
                df2, m.layer, m.name,
                mode="overwrite",
                partition_by=["batch_period"],
                sort_within_partitions=m.cluster_by,
            )
            return self.catalog.read(m.layer, m.name)
        evolved = m.on_schema_change == "append_new_columns"
        target = self.catalog.read(m.layer, m.name, merge_schema=evolved)
        df2 = self._reconcile_schema(m, df2, target)
        # one scalar job (documented driver action): the window anchor
        mx = df2.agg(F.max("batch_period").alias("mx")).first()["mx"]
        if mx is None:
            return target  # empty batch: nothing to rewrite
        if m.batch_size == "hour":
            cutoff = mx - _dt.timedelta(hours=m.lookback - 1)
        elif m.batch_size == "day":
            cutoff = mx - _dt.timedelta(days=m.lookback - 1)
        else:  # month
            total = mx.year * 12 + (mx.month - 1) - (m.lookback - 1)
            cutoff = mx.replace(year=total // 12, month=total % 12 + 1, day=1)
        recent = df2.filter(F.col("batch_period") >= F.lit(cutoff))
        self.catalog.write(
            recent, m.layer, m.name,
            mode="overwrite",
            partition_by=["batch_period"],
            sort_within_partitions=m.cluster_by,
            dynamic_partition_overwrite=True,
        )
        return self.catalog.read(m.layer, m.name, merge_schema=evolved)

    def _reconcile_schema(
        self, m: Model, df: DataFrame, target: DataFrame
    ) -> DataFrame:
        """Apply the model's ``on_schema_change`` policy to a drifted
        incremental batch (dbt semantics on immutable parquet):

        - ``ignore`` (default): align the batch to the TARGET schema —
          batch-only columns are dropped, target columns the batch lacks
          become typed NULLs. The table's schema never changes.
        - ``append_new_columns``: keep batch-only columns (the appended
          files carry the wider schema; readers use mergeSchema so older
          files surface NULLs there) and NULL-fill target columns the
          batch lacks. Columns are never removed.
        - ``fail``: refuse on any column-set difference.

        Type changes on a SHARED column are out of scope (as in dbt):
        the batch column is cast to the target's type in both keep modes,
        so a lossy drift surfaces as nulls/errors at write, not silent
        schema forks.
        """
        t_cols = dict(target.dtypes)
        d_cols = set(df.columns)
        if dict(df.dtypes) == t_cols:
            return df  # identical names AND types — nothing to do
        # same names but drifted TYPES falls through to the cast path
        # below (appending a type-incompatible file would fork the
        # table's schema); 'fail' fires on column-SET differences only,
        # per the docstring contract
        if set(t_cols) != d_cols and m.on_schema_change == "fail":
            raise ValueError(
                f"incremental model {m.name}: schema drift "
                f"(batch {sorted(d_cols)} vs target {sorted(t_cols)}) "
                "with on_schema_change='fail'"
            )
        aligned = [
            (F.col(c).cast(t) if c in d_cols else F.lit(None).cast(t)).alias(c)
            for c, t in t_cols.items()
        ]
        if m.on_schema_change == "append_new_columns":
            aligned += [F.col(c) for c in df.columns if c not in t_cols]
        return df.select(aligned)

    @staticmethod
    def _small_enough(df: DataFrame) -> bool:
        # Broadcasting the existing-key set is only safe when the target is
        # dimension-sized; for fact-sized targets let Catalyst/AQE pick the
        # join strategy (it will shuffle-hash or SMJ on the key).
        return False

    def _test_one(self, name: str, built: dict[str, DataFrame]) -> list:
        from dbt_repo_spark.plans.testing import run_tests

        m = self.models[name]
        if not m.tests or name not in built:
            return []
        spec = {
            col: [
                {"relationships": (built[t["relationships"][0]], t["relationships"][1])}
                if isinstance(t, dict) and "relationships" in t
                and isinstance(t["relationships"][0], str)
                else t
                for t in tests
            ]
            for col, tests in m.tests.items()
        }
        return run_tests(built[name], spec)

    def test(self, built: dict[str, DataFrame]) -> dict[str, list]:
        """dbt-test analog: run each model's declared test spec."""
        results = {}
        for name, m in self.models.items():
            if m.tests and name in built:
                results[name] = self._test_one(name, built)
        return results

    def build(
        self,
        selected: list[str] | None = None,
        full_refresh: bool = False,
        state: "dict | str | None" = None,
        defer_to: "Catalog | None" = None,
    ) -> tuple[dict[str, DataFrame], dict[str, str]]:
        """dbt build: materialize AND test each model in DAG order —
        a model's error-severity test failure SKIPS its transitive
        consumers (they would build on bad data), while siblings keep
        building. Warn-severity failures never block. Returns
        (built frames, status per model: ok | fail | skipped).
        """
        if isinstance(state, str):
            import json

            with open(state) as fh:
                state = json.load(fh)
        self._state = state
        self._defer = defer_to
        order = self._order(selected)
        built: dict[str, DataFrame] = {}
        status: dict[str, str] = {}
        bad: set[str] = set()
        for name in order:
            if any(d in bad for d in self.models[name].deps):
                status[name] = "skipped"
                bad.add(name)
                continue
            built[name] = self._build_one(name, built, full_refresh)
            failed = [
                r
                for r in self._test_one(name, built)
                if not r.passed and r.severity == "error"
            ]
            if failed:
                status[name] = "fail"
                bad.add(name)
            else:
                status[name] = "ok"
        return built, status
