"""Query plans: the oracle-checked registry consumed by __spark_entry__."""

from .queries import QUERIES, RETIRED, QuerySpec, flagship_star_revenue
from . import extensions  # noqa: F401 — registers the extension queries
from . import curation  # noqa: F401 — registers the curation queries

#: Full registry including entries retired from the driver's 50-row window
#: (bench + local verification still exercise these; see docs/REGISTRY.md).
ALL_QUERIES = {**QUERIES, **RETIRED}

__all__ = ["QUERIES", "RETIRED", "ALL_QUERIES", "QuerySpec", "flagship_star_revenue"]
