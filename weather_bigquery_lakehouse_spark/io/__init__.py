"""IO layer: tier readers/writers, freshness-guarded sinks, gold catalog."""

from .readers import load_testdata, read_table
from .writers import write_table
from .freshness import write_if_stale, upload_if_new_year
from .catalog import GoldCatalog

__all__ = [
    "load_testdata",
    "read_table",
    "write_table",
    "write_if_stale",
    "upload_if_new_year",
    "GoldCatalog",
]
