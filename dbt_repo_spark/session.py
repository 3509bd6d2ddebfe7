"""SparkSession factory with engine-wide physical defaults.

Scale policy (SURVEY.md §4): AQE on (runtime re-plan, skew-join splitting,
partition coalescing), UTC session timezone (source data carries +00:00
offsets — /root/reference/data/01_2025.csv:2), ANSI off so division/cast
semantics follow BigQuery's SAFE_* style via try_* functions, Arrow enabled
for the (rare) pandas boundary. Shuffle partition count defaults to the
local core count but is meant to be overridden to ~2-3x total cores on a
real cluster; AQE coalesces down after the fact, so over-provisioning is
cheap and under-provisioning is not.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem() -> str:
    """Driver-heap default scaled to the HOST, not hardcoded for the
    bench machine: ~0.5g per core (local[N] puts every executor thread
    in the one driver JVM) capped at 25% of physical RAM and at 16g.
    On the 32-core/128GB bench host this resolves to the same 16g the
    r06 fix landed; on a 4-core/8GB laptop it resolves to 2g instead of
    a JVM that cannot start. SPARK_GRAFT_DRIVER_MEM overrides."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    cores = os.cpu_count() or 4
    gb_by_cores = max(2, cores // 2)
    try:
        with open("/proc/meminfo") as fh:
            total_kb = int(
                next(l for l in fh if l.startswith("MemTotal")).split()[1]
            )
        gb_by_ram = max(1, total_kb // (4 * 1024 * 1024))  # 25% of RAM
    except (OSError, StopIteration, ValueError):  # non-Linux hosts
        gb_by_ram = gb_by_cores
    return f"{min(16, gb_by_cores, gb_by_ram)}g"

_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def conf_size_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark size conf ("64m", "10485760", "10MB") into bytes.

    Lets operators derive scale-adaptive gates (explicit broadcast hints)
    from the SESSION's own budget instead of hardcoded row counts (r13,
    ADVICE: a fixed gate bypasses autoBroadcastJoinThreshold and can OOM
    a small-heap session where the shuffle plan was safe)."""
    try:
        raw = str(spark.conf.get(key)).strip().lower().removesuffix("b")
        if raw and raw[-1] in _SIZE_SUFFIX:
            return int(float(raw[:-1]) * _SIZE_SUFFIX[raw[-1]])
        return int(raw)
    except Exception:
        return default


_PKG_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship dbt_repo_spark to Python workers via ``addPyFile``.

    mapInPandas / applyInPandasWithState closures reference module-level
    functions, which cloudpickle serializes BY REFERENCE — workers must
    import ``dbt_repo_spark`` themselves. When the driver process runs
    from outside the repo, worker sys.path doesn't include it; a zip of
    the package shipped through ``addPyFile`` fixes that for every
    deployment mode (local, YARN, k8s) without touching executor env.
    Idempotent per SparkContext.
    """
    import tempfile
    import zipfile

    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tempfile.gettempdir(), "dbt_repo_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(repo_root, "dbt_repo_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def fan_out(df, target: int | None = None):
    """Spread a narrow input across the cluster before CPU-heavy per-row work.

    A parquet input smaller than one file split — or written as a single
    row group — arrives as ONE partition, which serializes the whole
    map-side chain (shingle explosion, hashing, Arrow/NumPy batches) on a
    single core while the rest of the cluster idles. Repartition up to
    default parallelism ONLY when the input is narrower than that: on a
    real cluster a large scan already has thousands of splits and this is
    a no-op, while the pathological narrow case (small dim table, one
    giant unsplittable file) gets its one cheap round-robin shuffle.
    """
    if df.isStreaming:  # micro-batch sizing is the source's job
        return df
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "dbt-repo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we pin
    ``local[$SPARK_GRAFT_CPUS]``. All settings are plain public Spark confs.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else DEFAULT_CPUS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness-critical semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # --- adaptive execution: runtime shuffle coalescing + skew handling ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle / scan sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- python boundary: Arrow-batched, never row-at-a-time ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep the UI off in tests/bench for startup speed
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # local[N] puts driver + all executor threads in ONE JVM: 8g was
        # undersized for 32 cores (r06: heavy queries late in a 500-job
        # bench ran 1.6x their standalone medians — old-gen pressure).
        # ~0.5g/core scaled to host RAM (r07: no longer a flat 16g that
        # OOM-kills small hosts); a real cluster sizes executors separately.
        .config("spark.driver.memory", _default_driver_mem())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
