"""Key-driven JSON melt (SURVEY §2.8 R2, incl. the nested ALSI branch).

The reference iterates payload dicts row-at-a-time
(gie/transformer.py:5-64): every non-excluded key becomes a
(entity, variable, value) row; map-valued entries fan out one more
level with ``variable = f"{key}_{subkey}"`` (:25-43); null-like values
become NULL rows; values that fail float() are dropped (:33,52). Here
the whole contract is ONE narrow Spark pass — nested entries become an
array of (variable, raw) structs via ``transform(map_entries(...))``
and scalars a 1-element array, so a single ``explode`` serves both
branches: no union, no shuffle, linear in output rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_LIKE_VALUES = ("", " ")  # gie/constants.py:20


def melt_json_keys_nested(
    df: DataFrame,
    id_cols: Sequence[str],
    payload_col: str = "payload",
    excluded_keys: Sequence[str] = (),
    null_like: Sequence[str] = NULL_LIKE_VALUES,
) -> DataFrame:
    """Melt a JSON-string column into (id_cols..., variable, value
    double). Key set is DATA-driven (map_entries of the parsed payload)
    so new upstream fields appear as new series automatically; nested
    one-level dicts (which ``from_json(map<string,string>)`` preserves
    as raw JSON text) re-parse and fan out as ``key_subkey``."""
    ids = [F.col(c) for c in id_cols]
    outer = df.select(
        *ids,
        F.explode(
            F.map_entries(F.from_json(payload_col, "map<string,string>"))
        ).alias("kv"),
    )
    if excluded_keys:
        outer = outer.filter(~F.col("kv.key").isin(*excluded_keys))
    flat = outer.select(
        *id_cols,
        F.explode(
            F.when(
                F.col("kv.value").startswith("{"),
                F.transform(
                    F.map_entries(F.from_json("kv.value", "map<string,string>")),
                    lambda e: F.struct(
                        F.concat(F.col("kv.key"), F.lit("_"), e["key"]).alias(
                            "variable"
                        ),
                        e["value"].alias("raw"),
                    ),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.col("kv.key").alias("variable"),
                        F.col("kv.value").alias("raw"),
                    )
                )
            )
        ).alias("entry"),
    )
    val = F.col("entry.raw")
    is_null_like = val.isNull() | val.isin(*null_like)
    return (
        flat.select(
            *id_cols,
            F.col("entry.variable").alias("variable"),
            F.when(is_null_like, F.lit(None).cast("double"))
            .otherwise(val.try_cast("double"))
            .alias("value"),
            (is_null_like | val.try_cast("double").isNotNull()).alias("_keep"),
        )
        .filter("_keep")
        .drop("_keep")
    )
