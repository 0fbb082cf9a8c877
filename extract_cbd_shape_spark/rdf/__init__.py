from extract_cbd_shape_spark.rdf.trig import parse_trig  # noqa: F401
