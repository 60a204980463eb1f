"""Property-based checks (hypothesis): the distributed temporal operators
must agree with trivially-correct pure-Python references on arbitrary
small inputs — ordering, ties, gaps, and group boundaries included.

Example counts are kept small: each example is a Spark job; the point is
adversarial input SHAPES (hypothesis shrinks to minimal counterexamples),
not volume."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


# (user, t_seconds) unique pairs so orderings are total on both sides
_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50_000)),
    min_size=1,
    max_size=30,
    unique=True,
)

GAP = 3600


def _ref_sessions(rows):
    by_user = defaultdict(list)
    for u, t in rows:
        by_user[u].append(t)
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        start = end = ts[0]
        n, idx = 1, 1
        for t in ts[1:]:
            if t - end > GAP:
                out.add((u, idx, n, start, end))
                idx, n, start = idx + 1, 1, t
            else:
                n += 1
            end = t
        out.add((u, idx, n, start, end))
    return out


@settings(max_examples=6, deadline=None)
@given(_events)
def test_sessionize_matches_reference(spark, rows):
    from weather_bigquery_lakehouse_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(u, _ts(t)) for u, t in rows], "user long, ts timestamp"
    )
    got = {
        (
            r["user"],
            r["session_idx"],
            r["n_events"],
            int((r["session_start"] - EPOCH).total_seconds()),
            int((r["session_end"] - EPOCH).total_seconds()),
        )
        for r in sessionize(df, "user", "ts", gap_seconds=GAP).collect()
    }
    assert got == _ref_sessions(rows)


def _ref_range_count(left, right, window):
    out = {}
    for u, t in left:
        out[(u, t)] = sum(
            1 for ru, rt in right if ru == u and t - window <= rt < t
        )
    return out


@settings(max_examples=6, deadline=None)
@given(_events, _events)
def test_range_join_count_matches_reference(spark, left_rows, right_rows):
    from weather_bigquery_lakehouse_spark.operators.temporal import range_join_count

    left = spark.createDataFrame(
        [(u, _ts(t)) for u, t in left_rows], "user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(u, _ts(t)) for u, t in right_rows], "user long, r_ts timestamp"
    )
    got = {
        (r["user"], int((r["ts"] - EPOCH).total_seconds())): r["n_in_range"]
        for r in range_join_count(
            left, right, "user", "ts", "r_ts", window_seconds=GAP
        ).collect()
    }
    assert got == _ref_range_count(left_rows, right_rows, GAP)


def _ref_asof(left, right, strict):
    out = {}
    for u, t in left:
        cands = [rt for ru, rt in right if ru == u and (rt < t if strict else rt <= t)]
        out[(u, t)] = max(cands) if cands else None
    return out


@settings(max_examples=6, deadline=None)
@given(_events, _events, st.booleans())
def test_asof_join_matches_reference(spark, left_rows, right_rows, strict):
    from weather_bigquery_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(u, _ts(t)) for u, t in left_rows], "user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(u, _ts(t)) for u, t in right_rows], "user long, r_ts timestamp"
    )
    got = {
        (r["user"], int((r["ts"] - EPOCH).total_seconds())): (
            None if r["r_ts"] is None else int((r["r_ts"] - EPOCH).total_seconds())
        )
        for r in asof_join(left, right, "user", "ts", "r_ts", strict=strict).collect()
    }
    assert got == _ref_asof(left_rows, right_rows, strict)
