"""Capture .explain("formatted") + isolated timings for named queries.

Usage:
    python tools/plan_capture.py before q1 q2 ...   # -> plans/r12/<q>_before.txt
    python tools/plan_capture.py after  q1 q2 ...   # -> plans/r12/<q>_after.txt

Timing protocol mirrors bench.py (1 warmup + median of 3 on .count())
but each query runs in a FRESH teardown state and is additionally timed
once against the noop sink (guide §1.4) so plan-vs-sink differences are
visible. Prints a compact JSON line per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r13"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from dbt_repo_spark.queries import QUERIES
    from dbt_repo_spark.session import get_spark

    spark = get_spark(app_name=f"plan-capture-{tag}")

    def teardown() -> None:
        from dbt_repo_spark.operators.similarity import (
            release_recall_audit_pins,
        )

        release_recall_audit_pins()
        try:  # r13+ hygiene; absent when capturing pre-r13 "before" code
            from dbt_repo_spark.queries_scale import release_viterbi_broadcasts

            release_viterbi_broadcasts()
        except ImportError:
            pass
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            try:
                rdd.unpersist(True)
            except Exception:
                pass
        spark.sparkContext._jvm.System.gc()

    for name in names:
        fn = QUERIES[name]
        teardown()
        spark.sparkContext.setJobDescription(f"{name}: plan capture")
        df = fn(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        if os.environ.get("PLANS_ONLY"):
            print(json.dumps({"query": name, "tag": tag, "plans_only": True}))
            continue
        # timing: bench protocol (count) for comparability
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, SF_DIR).count()
        samples = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            samples.append(round(time.monotonic() - t0, 4))
        # one noop-sink run on the warm state (guide §1.4): computes every
        # column of every row, shows sink-vs-count divergence
        spark.sparkContext.setJobDescription(f"{name}: noop sink")
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        noop = round(time.monotonic() - t0, 4)
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "tag": tag,
                    "median_count_sec": round(statistics.median(samples), 4),
                    "samples": samples,
                    "noop_sec": noop,
                    "exchanges": plan.count("Exchange"),
                    "python_nodes": plan.count("EvalPython")
                    + plan.count("MapInArrow")
                    + plan.count("MapInPandas")
                    + plan.count("FlatMapGroupsInPandas"),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
