"""Multi-format date parsing.

The reference parses ``atualizado_em`` by coalescing three ``to_date``
attempts in a fixed order (reference src/etl/bronze_to_silver.py:43-50):
``yyyy-MM-dd``, then ``dd/MM/yyyy``, then ``MM-dd-yyyy``. Order matters for
ambiguous inputs; a string matching none of the formats yields NULL. Spark's
``to_date`` returns NULL on mismatch only under the non-strict parser
policy, so callers must run with ``spark.sql.legacy.timeParserPolicy``
unset (default CORRECTED + try semantics via ``try_to_date``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REFERENCE_FORMATS = ("yyyy-MM-dd", "dd/MM/yyyy", "MM-dd-yyyy")


def parse_date_multi(col: Column | str, formats: tuple[str, ...] = REFERENCE_FORMATS) -> Column:
    """First-match-wins date parse across candidate formats; NULL when none
    match. ``try_to_date`` (Spark ≥3.4) gives NULL-on-mismatch without
    touching the session parser policy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, fmt) for fmt in formats])
