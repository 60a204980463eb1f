"""Nested-struct flattening.

The reference flattens nested API JSON driver-side with
``pd.json_normalize`` + manual column prefixes
(reference src/etl/bronze_ingest.py:38-47,59-67). Spark-native version:
walk the schema and generate one ``select`` that aliases every leaf as
``parent_child`` — a pure projection, no data movement, works on columnar
reads of raw JSON landed in bronze.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively flatten all StructType columns into ``parent{sep}child``
    leaves. Arrays are left intact (explode is a separate, row-multiplying
    decision the caller makes — see reference bronze_ingest.py:60)."""
    for _ in range(max_depth):
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_fields:
            break
        cols = []
        for field in df.schema.fields:
            if isinstance(field.dataType, T.StructType):
                cols += [
                    F.col(f"`{field.name}`.`{sub.name}`").alias(f"{field.name}{sep}{sub.name}")
                    for sub in field.dataType.fields
                ]
            else:
                cols.append(F.col(f"`{field.name}`"))
        df = df.select(*cols)
    return df
