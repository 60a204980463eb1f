"""Worker-side environment helpers for Arrow-batched kernels.

Used from INSIDE functions shipped to Python workers (``mapInPandas`` /
``applyInPandasWithState`` bodies) — driver-side code has no business
importing this.
"""

from __future__ import annotations

import warnings

# Reused Python workers (spark.python.worker.reuse, default on) keep
# module state across tasks and grouped-state calls, so an unguarded
# filterwarnings would append one duplicate filter tuple per call —
# unbounded warnings.filters growth in a long stream. One flag per
# worker process is exactly the right scope.
_FILTER_INSTALLED = False


def silence_arrow_concat_futurewarning() -> None:
    """Suppress pandas' concat-with-empty-frames FutureWarning in this
    Python worker.

    PySpark's own Arrow serializers (``serializers.py`` —
    ``construct_record_batch`` pads data/state columns with all-NA frames
    before ``pd.concat``) trip a pandas deprecation warning on every
    batch with an empty side, flooding stderr of any run that touches a
    stateful kernel. The pad-then-concat happens in PySpark AFTER the
    user function returns, so the only seam available to user code is
    the worker process' warning filters — installed here, scoped to the
    one message (never a blanket ignore). Remove when the floor PySpark
    version pins pandas ≥3.0 behavior itself.
    """
    global _FILTER_INSTALLED
    if _FILTER_INSTALLED:
        return
    warnings.filterwarnings(
        "ignore",
        message="The behavior of DataFrame concatenation with empty or all-NA entries",
        category=FutureWarning,
    )
    _FILTER_INSTALLED = True
