"""Query plans: the oracle-checked registry consumed by __spark_entry__."""

from .queries import QUERIES, QuerySpec, flagship_star_revenue
from . import extensions  # noqa: F401 — registers the extension queries
from . import curation  # noqa: F401 — registers the curation queries

__all__ = ["QUERIES", "QuerySpec", "flagship_star_revenue"]
