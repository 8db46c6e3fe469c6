"""Flagship read query: the reference's ``GET /v2/data`` DATA_QUERY.

Reference shape (app/api/v2/queries.py:3-26): project 9 columns from
``meta_series JOIN data_observations`` (J1), apply up to 7 *optional*
conjunctive filters (F1 — ``(:p IS NULL OR col = :p)``), order by
observation time (W1), limit/offset (W3).

Transposed onto the driver star schema: ``orders`` plays the fact
(observations), ``customer`` plays the dimension (series catalog).

Spark-first differences from the reference:

- Optional filters are *plan-time pruned*: a parameter that is None
  contributes no predicate at all, so Catalyst sees only real
  predicates and pushes them into the Parquet scan. The reference's
  ``(:p IS NULL OR col = :p)`` pattern defeats index use in Postgres;
  the conditional-filter build is strictly better and semantically
  identical.
- The dimension side is broadcast (it is small relative to the fact) —
  at 100 TB the fact never shuffles for this join.
- LIMIT over an explicit total order (time + unique key tie-break)
  plans as TakeOrderedAndProject — a true distributed top-k, not a
  global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def data_query(
    spark: SparkSession,
    orders: DataFrame,
    customer: DataFrame,
    *,
    mktsegment: str | None = None,
    orderstatus: str | None = None,
    orderpriority: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
    min_price: float | None = None,
    max_price: float | None = None,
    limit: int = 1000,
    offset: int = 0,
) -> DataFrame:
    """DATA_QUERY: dim⋈fact with 7 optional filters, ordered, paginated.

    Mirrors reference app/api/v2/queries.py:3-26 semantics 1:1 (each
    None parameter means "no constraint").
    """
    fact = orders
    # F1: conditional predicate construction — only real filters enter
    # the plan, each one pushdown-eligible.
    if start_date is not None:
        fact = fact.filter(F.col("o_orderdate") >= F.lit(start_date).cast("timestamp"))
    if end_date is not None:
        fact = fact.filter(F.col("o_orderdate") <= F.lit(end_date).cast("timestamp"))
    if min_price is not None:
        fact = fact.filter(F.col("o_totalprice") >= F.lit(min_price))
    if max_price is not None:
        fact = fact.filter(F.col("o_totalprice") <= F.lit(max_price))
    if orderstatus is not None:
        fact = fact.filter(F.col("o_orderstatus") == orderstatus)
    if orderpriority is not None:
        fact = fact.filter(F.col("o_orderpriority") == orderpriority)

    dim = customer
    if mktsegment is not None:
        dim = dim.filter(F.col("c_mktsegment") == mktsegment)

    # J1: dim is small -> broadcast hash join; fact side never shuffles.
    joined = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey, "inner")

    # P1: explicit 9-column projection (column pruning reaches the scan).
    projected = joined.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
    )

    # W1+W3: deterministic total order (unique o_orderkey tie-break) so
    # limit/offset are stable across engines and runs.
    ordered = projected.orderBy("o_orderdate", "o_orderkey")
    if offset:
        ordered = ordered.offset(offset)
    return ordered.limit(limit)


def data_query_oracle_sql(
    *,
    mktsegment: str | None = None,
    orderstatus: str | None = None,
    orderpriority: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
    min_price: float | None = None,
    max_price: float | None = None,
    limit: int = 1000,
    offset: int = 0,
) -> str:
    """ANSI-SQL equivalent of :func:`data_query` for the DuckDB oracle."""
    preds = ["1=1"]
    if start_date is not None:
        preds.append(f"o.o_orderdate >= TIMESTAMP '{start_date}'")
    if end_date is not None:
        preds.append(f"o.o_orderdate <= TIMESTAMP '{end_date}'")
    if min_price is not None:
        preds.append(f"o.o_totalprice >= {min_price}")
    if max_price is not None:
        preds.append(f"o.o_totalprice <= {max_price}")
    if orderstatus is not None:
        preds.append(f"o.o_orderstatus = '{orderstatus}'")
    if orderpriority is not None:
        preds.append(f"o.o_orderpriority = '{orderpriority}'")
    if mktsegment is not None:
        preds.append(f"c.c_mktsegment = '{mktsegment}'")
    where = " AND ".join(preds)
    return f"""
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, o.o_orderstatus,
               o.o_orderpriority, c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE {where}
        ORDER BY o.o_orderdate, o.o_orderkey
        LIMIT {limit} OFFSET {offset}
    """
