"""Z-order (Morton curve) data layout: multi-dimensional clustering
for scan pruning.

The reference serves two access paths from one physical layout —
per-series time ranges (reference app/client/gas_client.py:36-38) and
cross-series time slices (reference app/db/queries.py:17-24). A table
sorted by one dimension answers one path cheaply and the other with a
full scan. Interleaving the bits of both sort keys (a Morton/Z-value)
bounds EVERY dimension's span within each file, so parquet min/max
row-group stats prune scans on either predicate — the same idea as
Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain column
expressions so it works on any Spark table.

At 100 TB: `zorder_by` is one stats pass (min/max per dimension, a
broadcastable 1-row aggregate) + one range repartition + a local sort
— no extra shuffle beyond the repartition every clustered write
already pays. Bit-twiddling stays JVM-side (`shiftleft`/`bitwiseOR`
whole-stage codegen; no UDF).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative integral
    columns into a Morton z-value (a in even positions, b in odd).

    Built as a flat bitwiseOR reduction of 2*bits shift terms — a
    balanced expression tree Catalyst folds into one codegen'd
    expression. Shift distances are Python ints (the classic-Column
    API requires literal ints, not Columns).
    """
    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(Column.bitwiseOR, terms)


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The same Morton interleave as `zvalue`, as portable SQL text
    (DuckDB/ANSI `>> << & |`) — used to oracle-check the layout."""
    terms = [f"((({a} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({b} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " | ".join(terms) + ")"


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster `df` on the Z-curve over (col_a, col_b): range-partition
    by z-value so each output file covers a compact square-ish region
    of the 2-D key space, then sort within partitions so parquet
    row-group min/max stats are tight on BOTH columns."""
    z = zvalue(F.col(col_a), F.col(col_b), bits)
    return (
        df.withColumn("_zval", z)
        .repartitionByRange(num_partitions, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
