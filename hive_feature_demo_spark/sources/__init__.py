"""Sources and sinks: schema-enforced ingest + scale-aware write layouts."""

from hive_feature_demo_spark.sources.readers import (  # noqa: F401
    FAN_SCHEMA,
    read_csv,
    read_json,
)
from hive_feature_demo_spark.sources.writers import (  # noqa: F401
    append_idempotent,
    write_bucketed_table,
    write_partitioned,
)
