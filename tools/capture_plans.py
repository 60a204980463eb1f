"""Capture `.explain("formatted")` for registry entries to files.

Round-13 deliverable support: the optimization judge checks plan claims
against committed plans/r13/<name>_{before,after}.txt files.

    python tools/capture_plans.py <outdir> <suffix> [name ...]

Defaults: sf dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
names default to every ALL_QUERIES entry. Entries whose construction
executes work (streaming replays, sink round-trips) still produce a plan
of the returned frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_bigquery_lakehouse_spark.session import build_session
from weather_bigquery_lakehouse_spark.plans import ALL_QUERIES


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or list(ALL_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(app_name="wbl_capture_plans")
    for name in names:
        fn = ALL_QUERIES[name].fn
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:  # private helper moved — public-ish fallback
                plan = df._jdf.queryExecution().explainString(
                    df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
        except Exception as exc:  # noqa: BLE001 — record the failure, keep sweeping
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
