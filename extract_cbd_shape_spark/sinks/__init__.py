from extract_cbd_shape_spark.sinks.materialize import (  # noqa: F401
    materialize_table,
    read_latest_snapshot,
)
