"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash. Use while iterating:

    python tools/verify_oracle.py [sf_dir] [query ...]

Pass ``--retired`` to also check the entries retired from the driver's
50-row window (they keep their oracles; see docs/REGISTRY.md).
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from pyspark.sql import types as T

from weather_bigquery_lakehouse_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    # STRICT on purpose: no float rounding, no decimal/int coercion. The
    # driver's gate hashes exact values; a lenient local normalization
    # green-lights queries the driver then fails (round-1 lesson). Queries
    # must make both engines produce bit-identical values instead.
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            # SIGN-STRICT on zero: the driver's hasher distinguishes -0.0
            # from 0.0 (round-10 lesson — the lenient `v == 0 → "0"` here
            # green-lit an embedding_covariance cell the driver then
            # hash-failed). Queries must unsign their zeros at the output
            # boundary on BOTH engines (functions/numeric.unsign_zero).
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _has_decimal(dtype) -> bool:
    """True if any (possibly nested) field is DECIMAL-typed.

    Registry rule: exact decimal math INSIDE a query, DOUBLE at the output
    boundary. The driver's hasher renders DECIMAL differently per engine
    (round-2 lesson: filter_project_pushdown was value-identical yet
    hash-failed solely on its DECIMAL(18,4) output column), so any
    DecimalType in a registered query's schema is an automatic local FAIL.
    """
    if isinstance(dtype, T.DecimalType):
        return True
    if isinstance(dtype, T.StructType):
        return any(_has_decimal(f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        return _has_decimal(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return _has_decimal(dtype.keyType) or _has_decimal(dtype.valueType)
    return False


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--retired"]
    with_retired = "--retired" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e

    spark = build_session(app_name="verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if with_retired or (only and not only <= set(qs)):
        from weather_bigquery_lakehouse_spark.plans import RETIRED

        qs = {**qs, **{n: s.fn for n, s in RETIRED.items()}}
        oracles.update(
            {n: s.oracle for n, s in RETIRED.items() if s.oracle is not None}
        )
    unknown = only - set(qs)
    if unknown:
        # a misspelled name would otherwise verify NOTHING and exit 0
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        print(f"     known: {sorted(qs)}")
        spark.stop()
        return 1
    failures = 0
    # Rounding-discipline lint (VERDICT r11 #5) runs inside the gate so a
    # new un-emulated rounded float boundary fails HERE, not in a driver
    # round — same rule as tests/test_signed_zero.py, enforced wherever
    # the oracle itself is checked.
    sys.path.insert(0, "/root/repo/tools")
    from round_lint import lint_sql

    for name in sorted(oracles):
        if only and name not in only:
            continue
        for p in lint_sql(name, oracles[name]):
            print(f"FAIL {p}")
            failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        bad_decimal = [f.name for f in sdf.schema.fields if _has_decimal(f.dataType)]
        if bad_decimal:
            print(
                f"FAIL {name}: DECIMAL-typed output column(s) {bad_decimal} — "
                "cast to DOUBLE at the output boundary (driver hash diverges "
                "on DECIMAL)"
            )
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            drows, dcols = rel.fetchall(), [d[0] for d in rel.description]
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {str(exc).splitlines()[0]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
