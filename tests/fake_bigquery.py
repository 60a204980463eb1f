"""An in-memory/on-disk fake of the spark-bigquery-connector, registered
through the Spark 4 Python DataSource API under the SAME format name the
real connector uses. This lets tests drive ``GoldCatalog(fmt="bigquery")``
through an actual distributed ``.save()`` — executor-side write tasks,
commit protocol and all — instead of stopping at plan assembly.

The fake persists committed rows as JSON under the ``fakeDir`` option
(GoldCatalog forwards arbitrary options to the writer, so tests inject
it alongside ``project``/``table``), one file per commit carrying the
table name, save mode, and rows. Uncommitted task output is dropped on
abort — mirroring the real connector's atomic-load behavior.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _RowsMessage(WriterCommitMessage):
    rows: list = field(default_factory=list)


class FakeBigQueryWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool, schema):
        self.options = dict(options)
        self.overwrite = overwrite
        self.colnames = [f.name for f in schema.fields]

    def write(self, iterator) -> _RowsMessage:  # executor-side
        return _RowsMessage(rows=[list(row) for row in iterator])

    def commit(self, messages) -> None:  # driver-side, all tasks succeeded
        out = {
            "table": self.options.get("table"),
            "project": self.options.get("project"),
            "mode": "overwrite" if self.overwrite else "append",
            "columns": self.colnames,
            "rows": [r for m in messages for r in m.rows],
        }
        fake_dir = self.options["fakedir"]  # option keys arrive lowercased
        os.makedirs(fake_dir, exist_ok=True)
        path = os.path.join(fake_dir, f"commit-{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(out, f)

    def abort(self, messages) -> None:
        pass  # nothing persisted until commit — atomic like a BQ load job


class FakeBigQueryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bigquery"

    def writer(self, schema, overwrite: bool) -> FakeBigQueryWriter:
        return FakeBigQueryWriter(self.options, overwrite, schema)


def load_commits(fake_dir: str) -> list[dict]:
    """All committed loads, oldest first (filenames are random — order by
    commit-file mtime; commits are sequential driver-side writes)."""
    paths = sorted(
        (os.path.join(fake_dir, p) for p in os.listdir(fake_dir) if p.endswith(".json")),
        key=lambda p: os.stat(p).st_mtime_ns,
    )
    out = []
    for p in paths:
        with open(p) as f:
            out.append(json.load(f))
    return out
