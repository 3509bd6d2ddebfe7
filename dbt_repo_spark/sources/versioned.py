"""Versioned tables: time travel, rollback, and vacuum on plain parquet.

A minimal commit log (the load-bearing idea of Delta/Iceberg, without
the format): every commit writes a NEW immutable version directory,
then atomically replaces the tiny JSON log that names the current
version. Readers resolve the log first, so they see exactly one
complete version — never a half-written directory (a crash between the
data write and the log replace leaves an orphan dir that is invisible
and later vacuumed). Rollback is a log entry pointing back to an old
version — O(1), non-destructive, auditable.

Why the engine needs it: reproducible training runs pin their inputs
(`export_dataset` pins content by hash; this pins tables by version so
"rebuild dataset X from table@v12" is a first-class read), and a bad
load is undone in one log write instead of a restore job.

At 100 TB: the log is O(versions) bytes; each version directory is an
ordinary immutable parquet table (all pruning/clustering applies);
storage cost is bounded by ``vacuum(keep_last=k)``. Format-level
niceties deliberately NOT re-implemented: file-granular commits
(Delta's add/remove actions), optimistic concurrency across writers —
single-writer-per-table is this engine's (and dbt's) execution model.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame

from dbt_repo_spark.sources.catalog import Catalog

LOG = "_versions.json"


class VersionedTable:
    def __init__(self, catalog: Catalog, layer: str, name: str):
        self.catalog = catalog
        self.spark = catalog.spark
        self.root = catalog.path(layer, name + "@versions")

    # ---- log ---------------------------------------------------------

    def _log_path(self) -> str:
        return os.path.join(self.root, LOG)

    def _read_log(self) -> dict:
        if not os.path.exists(self._log_path()):
            return {"latest": None, "history": []}
        with open(self._log_path()) as fh:
            return json.load(fh)

    def _write_log(self, log: dict) -> None:
        """The COMMIT POINT: readers switch versions exactly when this
        rename lands."""
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(log, fh, indent=1)
        os.replace(tmp, self._log_path())

    def _vdir(self, v: int) -> str:
        return os.path.join(self.root, f"v={v}")

    # ---- operations --------------------------------------------------

    def commit(self, df: DataFrame, message: str = "") -> int:
        os.makedirs(self.root, exist_ok=True)
        log = self._read_log()
        next_v = 1 + max(
            [e["version"] for e in log["history"]] or [0]
        )
        df.write.mode("overwrite").parquet(self._vdir(next_v))
        log["history"].append(
            {
                "version": next_v,
                "action": "commit",
                "message": message,
                "ts": time.time(),
            }
        )
        log["latest"] = next_v
        self._write_log(log)
        return next_v

    def read(self, version: int | None = None) -> DataFrame:
        log = self._read_log()
        v = version if version is not None else log["latest"]
        if v is None:
            raise FileNotFoundError(f"{self.root}: no committed version")
        committed = {e["version"] for e in log["history"] if e["action"] == "commit"}
        if v not in committed:
            raise ValueError(f"version {v} was never committed")
        if not os.path.isdir(self._vdir(v)):
            raise ValueError(f"version {v} has been vacuumed")
        return self.spark.read.parquet(self._vdir(v))

    def latest_version(self) -> int | None:
        return self._read_log()["latest"]

    def rollback(self, to: int, message: str = "") -> None:
        """Point latest back to an old version — non-destructive (the
        rolled-back-from version stays readable and in history)."""
        log = self._read_log()
        committed = {e["version"] for e in log["history"] if e["action"] == "commit"}
        if to not in committed:
            raise ValueError(f"cannot roll back to uncommitted version {to}")
        if not os.path.isdir(self._vdir(to)):
            raise ValueError(f"cannot roll back to vacuumed version {to}")
        log["history"].append(
            {"version": to, "action": "rollback", "message": message, "ts": time.time()}
        )
        log["latest"] = to
        self._write_log(log)

    def history(self) -> list[dict]:
        return list(self._read_log()["history"])

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Delete version directories beyond the newest ``keep_last``
        commits (the CURRENT latest is always kept), plus any orphan
        dirs a crashed commit left behind. Returns removed versions."""
        log = self._read_log()
        commits = sorted(
            e["version"] for e in log["history"] if e["action"] == "commit"
        )
        keep = set(commits[-keep_last:]) if keep_last > 0 else set()
        if log["latest"] is not None:
            keep.add(log["latest"])
        removed = []
        if not os.path.isdir(self.root):
            return removed
        for d in os.listdir(self.root):
            if not d.startswith("v="):
                continue
            v = int(d.split("=")[1])
            if v in keep:
                continue
            shutil.rmtree(self._vdir(v), ignore_errors=True)
            removed.append(v)
        return sorted(removed)
