from extract_cbd_shape_spark.plans.pipeline import KGConstructionPipeline  # noqa: F401
