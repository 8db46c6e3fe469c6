"""Field-discovery type inference (SURVEY A4).

Mirrors the reference's per-VALUE lattice (field_discovery.py:5-16):
each non-null value is classified null|boolean|integer|float|json|
string independently, and a field's inferred type is the COMMA-JOINED
SORTED SET of observed value types (field_discovery.py:46 ``",".join(
sorted(meta["types"]))``) — so a mixed field reports e.g.
``"integer,string"``, and a boolean field containing both 'true' and
'false' is still ``"boolean"``. Pure Column builders, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def infer_value_type(v: Column) -> Column:
    """Per-value type under the reference lattice; NULL for null cells
    (nulls are counted separately, never typed — field_discovery.py:41)."""
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(v.isin("true", "false"), F.lit("boolean"))
        .when(v.rlike(r"^-?\d+$"), F.lit("integer"))
        .when(v.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), F.lit("float"))
        .when(v.rlike(r"^[\[{]"), F.lit("json"))
        .otherwise(F.lit("string"))
    )


def inferred_type_agg(value_type: Column) -> Column:
    """Aggregate: sorted comma-joined set of value types, 'null' when
    every cell was null (collect_set drops nulls, so an all-null field
    yields the empty set -> 'null')."""
    joined = F.concat_ws(",", F.array_sort(F.collect_set(value_type)))
    return F.when(joined == "", F.lit("null")).otherwise(joined)
