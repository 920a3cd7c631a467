from vector_db_handler_spark.functions.vector import (  # noqa: F401
    cosine_score,
    dot_product,
    l2_norm,
    vector_literal,
)
