from gas_data_pipeline_spark.streaming.incremental import (  # noqa: F401
    events_stream,
    run_stream_to_table,
)
