"""Registry-wide physical-plan lint: the anti-pattern sweep as a tool.

Every round the scale review re-checks the same plan invariants by hand
(no cartesian products, no `rand()` in any plan, no row-at-a-time Python
UDFs, nested-loop joins only for broadcast-bounded frames). This tool
automates that sweep over EVERY registry entry (driver window + retired
+ staged) so a regression is caught the day it lands, not at review:

    python tools/plan_lint.py [sf_dir]        # default sf0.001

For each entry it builds the DataFrame (entries that execute work on
construction — streaming replays, sink round-trips, eager checkpoints —
do so at the small SF) and lints the physical plan string:

FAIL (exit 1):
  * CartesianProduct          — an unbounded all-pairs join
  * rand(/randn(              — nondeterministic sampling in a plan
                                (house rule: content-addressed md5 fates)
  * BatchEvalPython           — row-at-a-time Python UDF in the plan
  * ArrowEvalPython           — scalar pandas_udf (the package's one
                                sanctioned Python surface is Arrow
                                mapInPandas / applyInPandas*)
  * monotonically_increasing_id — partition-order-dependent id anywhere
                                in a registry plan (r9 rule: a silent
                                tie-break/media-id fallback makes output
                                a function of cluster layout, not data)

INFO (reported, not failed — the reviewer judges the context):
  * BroadcastNestedLoopJoin   — legitimate ONLY when one side is a
                                1-row/bounded aggregate (totals attach,
                                probe frames); count per entry
  * MapInPandas / FlatMapGroupsInPandas[WithState] — the sanctioned
                                Arrow surfaces; listed so additions are
                                visible
  * SortMergeJoin / Exchange counts — shuffle-shape drift tracking

The committed per-round snapshot lives at docs/PLAN_LINT.md.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time

sys.path.insert(0, "/root/repo")

FAIL_PATTERNS = {
    "CartesianProduct": "unbounded all-pairs join",
    "rand(": "nondeterministic expression in plan",
    "randn(": "nondeterministic expression in plan",
    "BatchEvalPython": "row-at-a-time Python UDF",
    "ArrowEvalPython": "scalar pandas_udf (not a sanctioned surface)",
    "monotonically_increasing_id": "partition-order-dependent id in plan "
    "(house rule: explicit data-derived ids only — tie-breaks and media "
    "ids must be pure functions of the data)",
}
INFO_PATTERNS = [
    "BroadcastNestedLoopJoin",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "SortMergeJoin",
    "Exchange",
]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from weather_bigquery_lakehouse_spark.plans import ALL_QUERIES
    from weather_bigquery_lakehouse_spark.session import build_session

    spark = build_session(app_name="wbl_plan_lint", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    rows = []
    for name, spec in sorted(ALL_QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = spec.fn(spark, sf_dir)
            plan = _plan(df)
        except Exception as exc:  # build error is itself a lint failure
            failures += 1
            rows.append({"entry": name, "fails": [f"build error: {exc}"]})
            print(f"FAIL {name}: build error: {exc}", flush=True)
            continue
        fails = [
            f"{pat} ({why})" for pat, why in FAIL_PATTERNS.items() if pat in plan
        ]
        info = {p: plan.count(p) for p in INFO_PATTERNS if p in plan}
        rec = {
            "entry": name,
            "fails": fails,
            "info": info,
            "build_s": round(time.monotonic() - t0, 2),
        }
        rows.append(rec)
        if fails:
            failures += 1
            print(f"FAIL {name}: {'; '.join(fails)}", flush=True)
        else:
            tags = ", ".join(f"{k}={v}" for k, v in info.items())
            print(f"ok   {name}" + (f"  [{tags}]" if tags else ""), flush=True)

    print(json.dumps({
        "entries": len(rows),
        "failures": failures,
        "bnlj_entries": sum(1 for r in rows if r.get("info", {}).get("BroadcastNestedLoopJoin")),
        "pandas_entries": sum(
            1 for r in rows
            if r.get("info", {}).get("MapInPandas") or r.get("info", {}).get("FlatMapGroupsInPandas")
        ),
    }))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
