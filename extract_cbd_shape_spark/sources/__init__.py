from extract_cbd_shape_spark.sources.fixtures import quads_to_df, trig_to_df  # noqa: F401
