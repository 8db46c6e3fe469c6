"""Source connectors (SURVEY §2.1 SRC1-SRC7).

The fetch edge is driver-side (Spark has no built-in REST source);
everything after the fetch — flattening, normalization, fan-out — is
distributed DataFrame work. Transports are injectable so correctness
tests run on fixtures, never the network (SURVEY §7 Phase 3).
"""

from gas_data_pipeline_spark.sources.jdbc import (  # noqa: F401
    read_jdbc_table,
    write_jdbc_table,
)
from gas_data_pipeline_spark.sources.rest import (  # noqa: F401
    RestSource,
    flatten_entsog,
    flatten_gas_quality,
    flatten_instantaneous_flow,
    flatten_publication_catalogue,
    flatten_publications,
)
