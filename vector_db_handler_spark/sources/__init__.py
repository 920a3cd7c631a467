from vector_db_handler_spark.sources.tables import load_table  # noqa: F401
