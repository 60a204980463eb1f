"""Surrogate-key derivation — the reference's key contract, centralized.

Every dimension/fact id in the reference's star schema is
``sha2(natural_key_expr, 256)`` where the natural key is either a single
column cast to string or a ``concat_ws`` composite
(reference src/etl/silver_to_gold.py:98-181). The contract details that
must hold engine-wide (and that the DuckDB oracle checks):

  * keys are lowercase hex sha256 of the UTF-8 natural-key string;
  * composites use ``concat_ws(sep, ...)`` which SKIPS null components
    (so (a, NULL, c) and (a, c) with the same sep collide — a documented
    reference behavior we preserve, not a bug we introduce);
  * ``sha2`` of a NULL input is NULL (null natural key → null surrogate);
  * non-string components are cast to string first (dates → 'yyyy-MM-dd').

Fact foreign keys are RECOMPUTED hashes of the same natural keys, not
join-propagated (reference silver_to_gold.py:110-113 vs :158-166) — dims
and fact agree because both hash identical strings. This engine keeps that
property: FK derivation is a pure column expression, so the fact build
needs no join against the date/condition dims at all (fewer shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SEP = ":"


def _as_string(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def surrogate_key(col: Column | str) -> Column:
    """sha256 hex of a single natural-key column (cast to string).

    Reference shape: ``F.sha2(F.col('data').cast('string'), 256)``
    (silver_to_gold.py:110-113)."""
    return F.sha2(_as_string(col), 256)


def composite_key(*cols: Column | str, sep: str = DEFAULT_SEP) -> Column:
    """sha256 hex of a ``concat_ws``-joined composite natural key.

    Reference shapes: ``sha2(concat_ws(':', id_ibge, id_cptec), 256)``
    (silver_to_gold.py:98-101) and
    ``sha2(concat_ws('_', id_city, id_forecast_date, id_weather_condition), 256)``
    (silver_to_gold.py:171-179)."""
    return F.sha2(F.concat_ws(sep, *[_as_string(c) for c in cols]), 256)
