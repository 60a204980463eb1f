"""Numeric output-boundary helpers shared by engine and oracle plans.

The one that exists today: signed-zero normalization. IEEE-754 carries a
sign bit on zero, and ``ROUND`` on a tiny negative quantity preserves it —
DuckDB's ``ROUND(-4e-9, 6)`` is ``-0.0`` while Spark's ``F.round`` (via
BigDecimal HALF_UP) emits ``+0.0``. The two are ``==``-equal but hash
DIFFERENTLY under the driver's exact value hasher (round-10 lesson: one
``-0.0`` cell out of 2,080 turned ``embedding_covariance`` driver-red
while the local gate, then zero-sign-lenient, stayed green).

Registry rule, enforced by ``tests/test_signed_zero.py``: every float
output column whose expression can be NEGATIVE (differences, covariance,
z-scores, log-ratios, signed drift) is normalized at the output boundary
on BOTH engines — ``unsign_zero`` here, ``+ 0.0`` in the DuckDB SQL —
because ``x + 0.0 == x`` for every x except ``-0.0 → +0.0`` (IEEE
round-to-nearest addition; NaN and ±inf pass through unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unsign_zero(col: Column) -> Column:
    """Normalize ``-0.0`` to ``+0.0`` at a float output boundary.

    ``col + 0.0``: the identity for every double except negative zero
    (IEEE: ``-0.0 + 0.0 = +0.0``), and NULL-transparent (NULL + 0.0 is
    NULL in Spark's non-ANSI arithmetic, matching DuckDB). Apply AFTER
    the final ``F.round`` — rounding is where the signed zero is minted.
    """
    return col + F.lit(0.0)


def unsign_zero_sql(expr: str) -> str:
    """The oracle-side twin: wrap a DuckDB float expression so its zeros
    are sign-normalized identically to :func:`unsign_zero`."""
    return f"({expr} + 0.0)"


def spark_round_sql(expr: str, digits: int) -> str:
    """DuckDB emulation of Spark's ``F.round(double, digits)`` — the
    oracle-side twin for every rounded float OUTPUT column.

    Why plain ``ROUND`` is not engine-portable (round-11 lesson): Spark
    rounds the double's SHORTEST DECIMAL REPR (``BigDecimal.valueOf``
    goes through ``Double.toString``; HALF_UP) while DuckDB's ``ROUND``
    rounds the BINARY value. They disagree exactly when the true result
    is an exact decimal half-way point whose nearest double lies on the
    other side — which integer-ratio quotients hit for real:
    ``708345 / 22e6`` is exactly ``0.0321975``; its nearest double is
    just BELOW half, so DuckDB says 0.032197 while Spark reads the repr
    "0.0321975" and says 0.032198 (the sf0.001 ``quality_bigram_lm`` /
    ``quality_ccnet_buckets`` hash fails).

    The emulation reproduces Spark's pipeline inside DuckDB: VARCHAR
    cast = shortest round-trip repr (both engines use shortest-repr
    printing), DECIMAL(38,15) cast = BigDecimal of that string, DECIMAL
    ``ROUND`` = half-away-from-zero (Java HALF_UP), DOUBLE cast back,
    ``+ 0.0`` = the signed-zero normalization (subsumes
    :func:`unsign_zero_sql` — a rounded ``-0.0`` comes back ``+0.0``
    exactly like Spark). Identity wherever the two engines already
    agreed, so swapping it in can only remove divergence.

    Range contract: |expr| < 1e23 (the DECIMAL(38,15) integer range) —
    every rounded output in this registry is a ratio, probability,
    score, mean, or norm far below that. NaN/Inf would fail the DECIMAL
    cast loudly; registry outputs are finite by construction
    (denominators are guarded positive).
    """
    return (
        f"(CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,15)), "
        f"{digits}) AS DOUBLE) + 0.0)"
    )
