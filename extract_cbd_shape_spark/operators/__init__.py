from extract_cbd_shape_spark.operators.extract import (  # noqa: F401
    BulkCBDShapeExtractor,
    Member,
)
