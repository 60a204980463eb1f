"""Skew-mitigation utilities for joins on hot keys.

AQE's skew-join splitting (on in session.py) handles skew it can SEE at
runtime. ``salted_join`` is the explicit lever for when the skew is known
up front (a viral user id, a null-ish default key, a power-law entity):
the left side is spread across ``n_salts`` sub-keys and the right side is
replicated once per salt, so one hot key's rows land on ``n_salts``
partitions instead of one straggler task.

Use when right is too big to broadcast but small enough that n_salts×
replication is cheap relative to the straggler it removes — the standard
trade. The salt is derived from a hash of the whole left row, so the plan
is deterministic across retries (no ``rand()`` — a retried task must
re-derive the same salt or the join duplicates/drops rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on ``on`` with an ``n_salts``-way
    salt: left rows get ``hash(row) mod n_salts``, right rows are exploded
    to every salt value, and the join keys on (on, salt). Result equals the
    plain join exactly; only the shuffle layout changes."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")
