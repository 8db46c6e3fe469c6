"""Driver query suite — one module per SURVEY.md §2 operator family.

Each module registers named queries (Spark plan + DuckDB oracle) in
:mod:`gas_data_pipeline_spark.registry`.
"""
