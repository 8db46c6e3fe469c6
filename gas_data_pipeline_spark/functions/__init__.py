"""Reusable column-expression helpers (SURVEY §2.7 / §2.10).

All pure Column builders — JVM-side expressions, no Python UDFs —
so they inline into whole-stage codegen and never leave the hot path.
"""

from gas_data_pipeline_spark.functions.series import (  # noqa: F401
    clean_value,
    date_chunks,
    make_series_id,
    make_series_id_static,
    parse_series_part,
)
