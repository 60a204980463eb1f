"""Kimball star-schema builders — the reference's gold layer, generalized.

The reference builds 4 dims + 1 fact (src/etl/silver_to_gold.py:77-195):
  * distinct-projection dims with sha2 surrogate keys (:108-138),
  * one conformed dim via an inner equi-join of two sources (:85-96),
  * a fact whose FKs are RECOMPUTED sha2 hashes of natural keys rather
    than join-propagated ids (:158-166 — dims and fact agree because both
    hash the same natural key).

Scale notes baked in:
  * dims are small → `F.broadcast` them into fact joins (BHJ, no shuffle
    of the fact side);
  * distinct-projection dims are a hash aggregate on a narrow projection
    — Catalyst prunes the scan to exactly the dim columns;
  * recomputed FKs mean the fact build joins ONLY the dims that contribute
    attributes, not every dim — at 100 TB that removes shuffles entirely
    for date/condition-style dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.keys import composite_key, surrogate_key


def build_dim_distinct(
    df: DataFrame,
    natural_cols: list[str],
    key_name: str,
    key_expr: Column | None = None,
) -> DataFrame:
    """Dim = distinct projection of natural columns + sha2 surrogate key.

    Reference shape (dim_update_date / dim_forecast_date /
    dim_weather_condition, silver_to_gold.py:108-138): the key hashes the
    FIRST natural column unless ``key_expr`` overrides."""
    dim = df.select(*natural_cols).distinct()
    key = key_expr if key_expr is not None else surrogate_key(natural_cols[0])
    return dim.select(key.alias(key_name), *natural_cols)


def build_dim_conformed(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    key_name: str,
    key_cols: list[Column | str],
    select_cols: list[Column],
    broadcast_right: bool = True,
) -> DataFrame:
    """Conformed dim from two sources via inner equi-join + composite key.

    Reference shape (dim_city = IBGE ⋈ CPTEC on name equality with
    coalesce'd attributes + sha2(concat_ws(':', ids)),
    silver_to_gold.py:85-101)."""
    rhs = F.broadcast(right) if broadcast_right else right
    return left.join(rhs, on, "inner").select(
        composite_key(*key_cols).alias(key_name), *select_cols
    )


def build_fact(
    base: DataFrame,
    dim_joins: list[tuple[DataFrame, Column]],
    fk_exprs: dict[str, Column],
    fact_key_name: str,
    fact_key_cols: list[Column | str],
    measures: list[Column],
) -> DataFrame:
    """Fact = base ⋈ attribute dims (broadcast), FKs recomputed as hash
    expressions, composite fact id.

    Reference shape (fact_weather, silver_to_gold.py:144-195): one join
    per attribute-contributing dim (J2), `sha2` FK recomputation for the
    rest, `sha2(concat_ws('_', fks...))` fact id."""
    df = base
    for dim, cond in dim_joins:
        df = df.join(F.broadcast(dim), cond, "inner")
    fks = [expr.alias(name) for name, expr in fk_exprs.items()]
    fact_id = composite_key(*fact_key_cols, sep="_").alias(fact_key_name)
    return df.select(fact_id, *fks, *measures)
