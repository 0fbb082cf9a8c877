from extract_cbd_shape_spark.shapes.ast import (  # noqa: F401
    AlternativePath,
    InversePath,
    NodeLink,
    OneOrMorePath,
    Path,
    PredicatePath,
    SequencePath,
    ShapeError,
    ShapeTemplate,
    ZeroOrMorePath,
    ZeroOrOnePath,
    reduce_word,
    ROOT_WORD,
)
from extract_cbd_shape_spark.shapes.compiler import ShapesGraph  # noqa: F401
