"""Scalar-function library: keys, dates, cleaning, profiling, flattening."""

from .keys import surrogate_key, composite_key
from .dates import parse_date_multi
from .cleaning import drop_null_rows, trim_strings, dedupe_rows, drop_columns, normalize_names
from .profiling import profile, distinct_counts, consistency_violations
from .flatten import flatten_structs
from .numeric import unsign_zero, unsign_zero_sql

__all__ = [
    "surrogate_key",
    "composite_key",
    "parse_date_multi",
    "drop_null_rows",
    "trim_strings",
    "dedupe_rows",
    "drop_columns",
    "normalize_names",
    "profile",
    "distinct_counts",
    "consistency_violations",
    "flatten_structs",
    "unsign_zero",
    "unsign_zero_sql",
]
